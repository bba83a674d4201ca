#!/bin/bash
# Round-4 part 6: re-warm the compile cache for the FINAL committed source
# (the s2d-resident auto gate shifted steps.py line numbers) and record
# the final bench + the gated-resident confirmation at 1024.
set -u
cd /root/repo
OUT=tools/hw_round4_results.jsonl
probe() { timeout 300 python3 -c "import jax; print(jax.devices())" >/dev/null 2>&1; }
run() {
    local label=$1; shift
    echo "=== $label: $*" >&2
    local line
    line=$("$@" 2>/dev/null | tail -1)
    if [ -n "$line" ]; then
        echo "{\"phase\": \"$label\", \"result\": $line}" >> "$OUT"
    else
        echo "{\"phase\": \"$label\", \"result\": null}" >> "$OUT"
    fi
}
probe || exit 3
run gated_1024 timeout 3600 python tools/measure_step.py --size 1024
run gated_512 timeout 2400 python tools/measure_step.py
run bench_final2 timeout 14400 python bench.py

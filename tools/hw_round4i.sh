#!/bin/bash
# Round-4 part 9: bf16 quality at 1024px (VERDICT r3 weak #6 asked for
# 512 AND 1024; bench.py records 512).
set -u
cd /root/repo
OUT=tools/hw_round4_results.jsonl
run() {
    local label=$1; shift
    echo "=== $label: $*" >&2
    local line
    line=$("$@" 2>/dev/null | tail -1)
    [ -n "$line" ] && echo "{\"phase\": \"$label\", \"result\": $line}" >> "$OUT" \
        || echo "{\"phase\": \"$label\", \"result\": null}" >> "$OUT"
}
timeout 300 python3 -c "import jax; jax.devices()" >/dev/null 2>&1 || exit 3
run quality_1024 timeout 7200 python tools/measure_quality.py --size 1024

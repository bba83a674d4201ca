#!/bin/bash
# Round-4 part 8: envelope datapoints on the FINAL frozen source —
# the 2560px single-chip ceiling and the 300px interactive size under
# the round-4 defaults.
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
run final_2560 timeout 3600 python tools/measure_step.py --size 2560 --chunk 20
run final_300 timeout 2400 python tools/measure_step.py --size 300

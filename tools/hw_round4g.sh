#!/bin/bash
# Round-4 part 7: serving re-measures on the FINAL frozen source (warm
# cache): interactive 512, pooled 4x256 and 8x256 — the round-record
# numbers with today's link RTT recorded alongside.
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
run serve_512_v2 timeout 2400 python tools/measure_serving.py --size 512 \
    --latency-target 2.0 --seconds 30
run pool_4x256_v2 timeout 2400 python tools/measure_serving.py --tier pool \
    --size 256 --lanes 4 --steps-per-dispatch 60 --seconds 30
run pool_8x256_v2 timeout 2400 python tools/measure_serving.py --tier pool \
    --size 256 --lanes 8 --steps-per-dispatch 60 --seconds 30

#!/bin/bash
# Round-4 hardware queue, part 4 (final): confirmation arms on the shipped
# defaults (BF16_FEED + BF16_HISTORY on), the paired-collect video
# re-measure, and the FULL bench.py — which also leaves the driver's
# persistent compile cache warm for the end-of-round run, keyed against
# the final committed source.
set -u
cd "$(dirname "$0")/.."
OUT=tools/hw_round4_results.jsonl

probe() {
    timeout 300 python3 -c "import jax; print(jax.devices())" >/dev/null 2>&1
}

run() {  # run <label> <cmd...>
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

if ! probe; then
    echo "tunnel down — aborting" >&2
    exit 3
fi

# 1. Final confirmation arms (expect ~4.04 / 19.79 / 89.85).
run final_512 timeout 2400 python tools/measure_step.py
run final_1024 timeout 3600 python tools/measure_step.py --size 1024
run final_2048 timeout 3600 python tools/measure_step.py --size 2048 --chunk 20

# 2. Video with paired collection + fused prep (cold then warm).
run video2_cold timeout 3600 python tools/measure_video.py --frames 8
run video2_warm timeout 2400 python tools/measure_video.py --frames 8

# 3. Interactive 512 re-measure on the final step.
run serve_512_final timeout 3600 python tools/measure_serving.py --size 512 \
    --latency-target 2.0 --seconds 30

# 4. Full bench (headline + bf16 + quality + video + north star): records
# the round-4 numbers and warms every program the driver's end-of-round
# bench will compile.
run bench_final timeout 14400 python bench.py

echo "done; results in $OUT" >&2

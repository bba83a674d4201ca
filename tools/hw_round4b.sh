#!/bin/bash
# Round-4 hardware queue, part 2: confirmation arms on the flipped
# defaults (BF16_FEED on, S2D_RESIDENT off), the 1024px trace for the
# copy-budget audit, the pipelined video mode, and the serving tier on
# the new step — interactive 512, pooled 4x256/4x512, and the
# multi-scale serving ladder's converge A/B at 1024 (each converge/video
# arm runs twice: the first pays cold compiles, the second measures).
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

# 1. Confirmation arms on the committed defaults (expect ~4.15/20.1/92.7).
run confirm_512 timeout 2400 python tools/measure_step.py
run confirm_1024 timeout 3600 python tools/measure_step.py --size 1024 \
    --keep-trace /tmp/trace_1024_r4final
run confirm_2048 timeout 3600 python tools/measure_step.py --size 2048 \
    --chunk 20

# 2. Video mode: cold (compiles) then warm (the measurement).
run video_cold timeout 3600 python tools/measure_video.py --frames 8
run video_warm timeout 2400 python tools/measure_video.py --frames 8

# 3. Interactive + pooled serving on the new step.
run serve_512_lat2 timeout 3600 python tools/measure_serving.py --size 512 \
    --latency-target 2.0 --seconds 30
run pool_4x256 timeout 3600 python tools/measure_serving.py --tier pool \
    --size 256 --lanes 4 --steps-per-dispatch 60 --seconds 30
run pool_4x512 timeout 3600 python tools/measure_serving.py --tier pool \
    --size 512 --lanes 4 --steps-per-dispatch 60 --seconds 30

# 4. Serving-ladder converge A/B at 1024 (cold then warm per arm).
run ladder_single_cold timeout 3600 python tools/measure_serving.py \
    --size 1024 --converge --latency-target 2.0 --seconds 240
run ladder_single_warm timeout 2400 python tools/measure_serving.py \
    --size 1024 --converge --latency-target 2.0 --seconds 240
run ladder_ladder_cold timeout 5400 python tools/measure_serving.py \
    --size 1024 --converge --ladder 120 --latency-target 2.0 --seconds 300
run ladder_ladder_warm timeout 3600 python tools/measure_serving.py \
    --size 1024 --converge --ladder 120 --latency-target 2.0 --seconds 300

echo "done; results in $OUT" >&2

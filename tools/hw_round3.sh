#!/bin/bash
# Round-3 hardware measurement queue (run when the TPU tunnel is up).
# Each phase appends a JSON line to tools/hw_round3_results.jsonl so a
# mid-queue tunnel death keeps everything measured so far.
#
# Probe first (CLAUDE.md): backend init over a dead tunnel HANGS.
set -u
cd "$(dirname "$0")/.."
OUT=tools/hw_round3_results.jsonl

probe() {
    timeout 180 python3 -c "import jax; print(jax.devices())" >/dev/null 2>&1
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

# 1. Full benchmark FIRST (headline f32 + bf16 + MFU + 1024px north-star):
#    the single most valuable artifact if the tunnel dies mid-queue.
run bench timeout 9000 python bench.py

# 2. S2D_TRANSFORM A/B (512px bf16, on-device scan spans, fresh process
#    per arm). If 'slice' wins, flip the default in models/vgg19.py
#    AFTER the queue (editing a traced file invalidates the compile cache).
run s2d_transpose timeout 2400 python tools/measure_step.py \
    --s2d-transform transpose
run s2d_slice timeout 2400 python tools/measure_step.py \
    --s2d-transform slice

# 3. Serving rates (VERDICT item-1 deliverables — before the riskier
#    high-res/remat/pallas phases): interactive adaptive=60 depth-2,
#    pooled 4-lane, and the latency-targeted tuner arm.
run serve_interactive timeout 3600 python tools/measure_serving.py \
    --tier app --size 300 --adaptive 60 --pipeline-depth 2
run serve_pool timeout 3600 python tools/measure_serving.py \
    --tier pool --size 256 --lanes 4 --steps-per-dispatch 60
run serve_latency_target timeout 3600 python tools/measure_serving.py \
    --tier app --size 300 --adaptive 60 --pipeline-depth 2 \
    --latency-target 2.0

# 4. High-res regime step times + traces for MFU analysis (VERDICT r3 #6).
run hires_1024 timeout 3600 python tools/measure_step.py --size 1024 \
    --remat --keep-trace /tmp/trace_1024
run hires_2048 timeout 3600 python tools/measure_step.py --size 2048 \
    --remat --chunk 20 --keep-trace /tmp/trace_2048

# 3b. Remat-policy A/B (per-conv vs per-block) + single-chip max-res push:
#     block remat keeps only pool boundaries + taps, so 3072/3840 may fit
#     where round 2's per-conv remat OOMed at 3840.
run remat_block_2048 timeout 3600 python tools/measure_step.py --size 2048 \
    --remat block --chunk 20
run remat_block_3072 timeout 3600 python tools/measure_step.py --size 3072 \
    --remat block --chunk 10
run remat_conv_3072 timeout 3600 python tools/measure_step.py --size 3072 \
    --remat conv --chunk 10
run remat_block_3840 timeout 3600 python tools/measure_step.py --size 3840 \
    --remat block --chunk 10

# 4. Pallas regime search (VERDICT r2 weak #7): does the fused style
#    kernel win anywhere the 512px measurement didn't cover? If every arm
#    loses, ARCHITECTURE.md retires the kernels explicitly.
run pallas_1024 timeout 3600 python tools/measure_step.py --size 1024 \
    --remat --pallas
run pallas_2048 timeout 3600 python tools/measure_step.py --size 2048 \
    --remat --chunk 20 --pallas

# 6. Mid-run resize latency, cold vs background-prewarmed (the prewarm
#    exists to hide the minutes-long remote compile of the new grid).
run resize_cold timeout 3600 python tools/measure_serving.py \
    --size 300 --resize-to 512 --warm-seconds 20
run resize_prewarmed timeout 3600 python tools/measure_serving.py \
    --size 300 --resize-to 512 --warm-seconds 20 --prewarm

echo "done; results in $OUT" >&2

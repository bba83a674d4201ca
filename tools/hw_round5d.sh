#!/bin/bash
# Round-5 part 4: validate the L-BFGS stored-curvature fix on hardware and
# re-measure everything the fix's recompile generation touches.
#  - nan_diag_v2: the 256px bf16 divergence (NaN at iteration 9) must be
#    gone with sy computed from the stored pair.
#  - ns_calibrate_v2 (1 rep): the multi-scale rungs must report finite
#    losses; per-rung medians become usable.
#  - step arms: the fix changes the bf16 step's sy dot to bf16 operands —
#    re-confirm 512/1024/2048 device ms/step (fresh compile generation).
#  - ladder_ladder_v2: the serving-ladder quality number, now NaN-free at
#    the coarse rungs.
#  - pconv at 1024: if the 512 arm in part 3 ran, extend the A/B.
set -u
cd /root/repo
OUT=tools/hw_round5_results.jsonl
run() {
    local label=$1; shift
    echo "=== $label: $*" >&2
    local line
    line=$("$@" 2>/dev/null | tail -1)
    [ -n "$line" ] && echo "{\"phase\": \"$label\", \"result\": $line}" >> "$OUT" \
        || echo "{\"phase\": \"$label\", \"result\": null}" >> "$OUT"
}
timeout 300 python3 -c "import jax; jax.devices()" >/dev/null 2>&1 || exit 3

run nan_diag_v2 timeout 3600 python tools/diag_nan256.py
run ns_calibrate_v2 timeout 3600 python tools/calibrate_ns.py --reps 1

run pconv_micro_v3 timeout 7200 python tools/measure_pallas_conv.py --iters 60
run step512_pconv_v3 timeout 3600 python tools/measure_step.py --size 512 \
    --pallas-conv
run step1024_guard timeout 3600 python tools/measure_step.py --size 1024
run step1024_pconv_v2 timeout 3600 python tools/measure_step.py --size 1024 \
    --pallas-conv
run step2048_guard timeout 3600 python tools/measure_step.py --size 2048 \
    --chunk 20
run step2048_pconv_v2 timeout 3600 python tools/measure_step.py --size 2048 \
    --chunk 20 --pallas-conv

run ladder_ladder_v2 timeout 3600 python tools/measure_serving.py \
    --size 1024 --converge --ladder 120 --latency-target 2.0 --seconds 420

echo "round-5 part 4 done" >&2
date +%s > /tmp/hw5d_done

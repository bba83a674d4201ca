#!/bin/bash
# Round-5 part 3: the remaining measurement debt after the container restart
# cut hw_round5a short.
#  1. ns_calibrate — per-rung plateau iteration counts (3 reps), the input
#     to bench.py's fixed-schedule rewrite (VERDICT r4 #2).
#  2. ladder_single_r5 rerun — the part-1 arm burned its whole 300 s budget
#     on the cold 1024px remote compile (1 frame, initial loss). Run the
#     arm twice per the tool's own discipline: the first pays compiles, the
#     second is the measurement.
#  3. polish_1024_f32_v2 — the 512px arms flipped the polish default to
#     float32 (87% vs 8% gap recovery); confirm the f32 recovery at 1024.
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

# 0a. The pconv arms return null with stderr discarded by run(); capture
#     the real failure once, with stderr kept.
timeout 1800 python tools/measure_step.py --size 512 --pallas-conv \
    > /tmp/pconv_probe.out 2> tools/pconv_probe.err
echo "pconv probe exit $? (stderr in tools/pconv_probe.err)" >&2

# 0b. The ns_calibrate NaN: localize the first non-finite iterate and A/B
#     the suspects (bf16 curvature-pair storage, precision, grid size)
#     BEFORE burning another 90 min of calibration on a poisoned engine.
run nan_diag timeout 3600 python tools/diag_nan256.py

run ns_calibrate timeout 5400 python tools/calibrate_ns.py --reps 3

run ladder_single_warm timeout 2400 python tools/measure_serving.py \
    --size 1024 --converge --latency-target 2.0 --seconds 420
run ladder_single_r5b timeout 2400 python tools/measure_serving.py \
    --size 1024 --converge --latency-target 2.0 --seconds 420

run polish_1024_f32_v2 timeout 5400 python tools/measure_polish.py \
    --size 1024 --iters 240 --polish 60 --polish-precision float32

# 4. Fixed-kernel reruns: the hw_round5b pconv arms that launched before
#    the conv.py fix ran the 2-D-halo kernel Mosaic rejects (mixed
#    Element/Blocked specs + the W-halo divisibility wall); the 1-D
#    all-Element kernel replaced it mid-queue.
run pconv_micro_v2 timeout 7200 python tools/measure_pallas_conv.py --iters 60
run step512_pconv_v2 timeout 3600 python tools/measure_step.py --size 512 \
    --pallas-conv
run step512_base_v2 timeout 3600 python tools/measure_step.py --size 512

echo "round-5 part 3 done" >&2
date +%s > /tmp/hw5c_done

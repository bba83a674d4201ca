#!/bin/bash
# Round-5 part 5: post-flip confirmation (house discipline: re-run the
# no-flag arms AFTER a default flips) for PALLAS_CONV=True + the conv.py
# MAX_PIXELS cap, plus the post-NaN-gate calibration.
#  - step512/1024/2048 no-flag arms: expect ~3.5 / ~15.4 ms at 512/1024
#    (the flip) and ~88.7 at 2048 (the cap returns the 1-Mpx layers to
#    XLA; anything much above means the cap missed).
#  - ns_calibrate_v3: first calibration on the NaN-free engine — per-rung
#    medians become real data.
#  - pooled_4x256: the fused kernel under vmap through the real serving
#    tier (256px lanes are all-XLA at the gate, so this is a no-regression
#    check on the pooled aggregate).
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

run step512_final timeout 3600 python tools/measure_step.py --size 512
run step1024_final timeout 3600 python tools/measure_step.py --size 1024
run step2048_final timeout 3600 python tools/measure_step.py --size 2048 \
    --chunk 20

run ns_calibrate_v3 timeout 5400 python tools/calibrate_ns.py --reps 2

run pooled_4x256 timeout 2400 python tools/measure_serving.py --tier pool \
    --size 256 --lanes 4 --seconds 120

echo "round-5 part 5 done" >&2
date +%s > /tmp/hw5e_done

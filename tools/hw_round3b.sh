#!/bin/bash
# Round-3 hardware queue, part 2: the phases part 1 didn't reach before
# the session died (remat_conv_3072 onward), plus arms motivated by the
# part-1 evidence:
#   * serve_latency_target2 — the tuner calibration rework (part 1
#     measured the death spiral at 8.2 it/s; this validates the fix).
#   * serve_interactive2 — variance check vs part 1's 32.8 it/s (round 2
#     measured 57 at the same settings; the tunnel is time-shared).
#   * hires_*_slice — part 1's 512px A/B had 'slice' winning (4.75 vs
#     5.09 ms); decide whether the default flips at high res too.
#   * hires_*_noremat — the 1024/2048 traces showed remat-boundary
#     layout copies are a large share of the 43% data-movement bill,
#     and bf16 activations at these sizes should fit 16 GB without
#     remat at all.
# Ordered cheap/valuable first, OOM-risky fit attempts last.
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

# 1. The tuner fix, on the link that broke it.
run serve_latency_target2 timeout 3600 python tools/measure_serving.py \
    --tier app --size 300 --adaptive 60 --pipeline-depth 2 \
    --latency-target 2.0
run serve_interactive2 timeout 3600 python tools/measure_serving.py \
    --tier app --size 300 --adaptive 60 --pipeline-depth 2

# 2. Mid-run resize latency, cold vs background-prewarmed.
run resize_cold timeout 3600 python tools/measure_serving.py \
    --size 300 --resize-to 512 --warm-seconds 20
run resize_prewarmed timeout 3600 python tools/measure_serving.py \
    --size 300 --resize-to 512 --warm-seconds 20 --prewarm

# 3. S2D 'slice' at high res (512px winner; does it hold?).
run hires_1024_slice timeout 3600 python tools/measure_step.py \
    --size 1024 --remat --s2d-transform slice
run hires_2048_slice timeout 3600 python tools/measure_step.py \
    --size 2048 --remat --chunk 20 --s2d-transform slice

# 4. No-remat arms: kill the remat-boundary copies if HBM allows.
run hires_1024_noremat timeout 3600 python tools/measure_step.py \
    --size 1024
run hires_2048_noremat timeout 3600 python tools/measure_step.py \
    --size 2048 --chunk 20

# 5. Pallas regime search (retire the kernels formally if every arm loses).
run pallas_1024 timeout 3600 python tools/measure_step.py --size 1024 \
    --remat --pallas
run pallas_2048 timeout 3600 python tools/measure_step.py --size 2048 \
    --remat --chunk 20 --pallas

# 6. Max-res fit attempts (per-conv vs per-block remat; 3840 push).
run remat_conv_3072 timeout 3600 python tools/measure_step.py --size 3072 \
    --remat conv --chunk 10
run remat_block_3072 timeout 3600 python tools/measure_step.py --size 3072 \
    --remat block --chunk 10
run remat_block_3840 timeout 3600 python tools/measure_step.py --size 3840 \
    --remat block --chunk 10

echo "done; results in $OUT" >&2

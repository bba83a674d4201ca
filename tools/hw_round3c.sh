#!/bin/bash
# Round-3 hardware queue, part 3: the bf16 loss-feed A/B (BF16_TAPS /
# STYLE_EINSUM, built from part 1+2's trace evidence that layout copies
# around the style-gradient matmul and the f32 tap boundary are a
# double-digit share of the step), the resize disk-cache control arm,
# and a final full bench with the round's winning defaults (also warms
# the compile cache for the driver's end-of-round BENCH run).
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

# 1. 512px bf16: baseline (post-port source, slice default) + each flag
#    + the combination. Fresh process per arm (the flags are read at
#    step-core build time).
run feed_base_512 timeout 2400 python tools/measure_step.py
run feed_taps_512 timeout 2400 python tools/measure_step.py --bf16-taps
run feed_einsum_512 timeout 2400 python tools/measure_step.py --style-einsum
run feed_both_512 timeout 2400 python tools/measure_step.py \
    --bf16-taps --style-einsum

# 2. The winning regime at 1024 with a kept trace (did the :402 copy and
#    the Gram-feed flip actually disappear?).
run feed_both_1024 timeout 3600 python tools/measure_step.py --size 1024 \
    --bf16-taps --style-einsum --keep-trace /tmp/trace_1024_feed

# 3. Resize control arm: no prewarm, warm disk cache — separates the
#    background-prewarm win from the persistent-compile-cache win
#    (part 2: cold 35.4 s, prewarmed+cached 2.0 s).
run resize_cached timeout 3600 python tools/measure_serving.py \
    --size 300 --resize-to 512 --warm-seconds 20

# 4. The best no-remat high-res points on the shipped defaults (slice)
#    with the feed flags — the round's final high-res numbers.
run feed_noremat_1024 timeout 3600 python tools/measure_step.py \
    --size 1024 --bf16-taps --style-einsum
run feed_noremat_2048 timeout 3600 python tools/measure_step.py \
    --size 2048 --chunk 20 --bf16-taps --style-einsum

# 5. Envelope extension attempt: 3072px OOMed under both remat policies
#    (RESOURCE_EXHAUSTED); BF16_TAPS halves the biggest resident taps
#    (conv1_1's s2d tap is 1.8 GB in f32 at 3072) — one shot at fitting.
run fit_3072_feed timeout 3600 python tools/measure_step.py \
    --size 3072 --remat block --chunk 10 --bf16-taps --style-einsum

echo "done; results in $OUT" >&2

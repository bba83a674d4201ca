#!/bin/bash
# Round-3 hardware queue, part 6 (final): the full bench on the shipped
# defaults (shaped L-BFGS history, STYLE_EINSUM, S2D_POOL='slice') —
# which also warms the persistent compile cache the driver's end-of-round
# bench.py run will hit — then the serving re-measures on the final step.
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

# 1. Full bench (f32 + bf16 + north-star) on final committed source.
run bench_final timeout 5400 python bench.py

# 2. Serving rates on the final step program.
run pooled_4x256_final timeout 3600 python tools/measure_serving.py \
    --tier pool --lanes 4 --size 256
run latency_300_final timeout 3600 python tools/measure_serving.py \
    --size 300 --latency-target 2.0

echo "done; results in $OUT" >&2

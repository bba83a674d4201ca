#!/bin/bash
# Round-3 hardware queue, part 4: validate the flat L-BFGS history layout
# (steps.py:137 scan-carry tiling flip, 0.34 ms/step at 1024px in the
# part-3 trace) + the STYLE_EINSUM shipped default, A/B the s2d-domain
# pool1 'slice' form (the vgg19.py:404/:357 eq/div layout flips, ~0.9
# ms/step at 1024), and re-measure the serving rates on the final step.
# The final full bench (which also warms the driver's end-of-round
# compile cache) runs separately AFTER any default flips so the cache
# keys match the committed source.
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

# 1. Flat-history L-BFGS + STYLE_EINSUM defaults at every size (fresh
#    processes; everything recompiles — the sources changed).
run flat_512 timeout 2400 python tools/measure_step.py
run flat_1024 timeout 3600 python tools/measure_step.py --size 1024 \
    --keep-trace /tmp/trace_1024_r3d
run flat_2048 timeout 3600 python tools/measure_step.py --size 2048 --chunk 20

# 2. s2d-domain pool1 'slice' A/B.
run pool_slice_512 timeout 2400 python tools/measure_step.py --s2d-pool slice
run pool_slice_1024 timeout 3600 python tools/measure_step.py --size 1024 \
    --s2d-pool slice
run pool_slice_2048 timeout 3600 python tools/measure_step.py --size 2048 \
    --chunk 20 --s2d-pool slice

# 3. Serving rates on the final step program.
run pooled_4x256_r3d timeout 3600 python tools/measure_serving.py \
    --tier pool --lanes 4 --size 256
run latency_300_r3d timeout 3600 python tools/measure_serving.py \
    --size 300 --latency-target 2.0

echo "done; results in $OUT" >&2

#!/bin/bash
# Round-3 hardware queue, part 5: confirm the flat-L-BFGS-history REVERT
# (part 4 measured the flat layout at 6.52/29.8/132.3 ms/step vs the
# shaped 4.64/22.45/105.0 — a 26-40% regression; optim/lbfgs.py is back
# to shaped buffers) and re-run the s2d-domain pool1 'slice' A/B on top
# of the reverted code (on flat code 'slice' won 5.6/5.1/6.4% — both
# arms carried the regression, so the win needs re-measuring before the
# default flips). Serving re-measures + the final full bench run after
# any default flip so the driver's compile cache matches committed source.
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

# 1. Reverted (shaped) history at every size — expect ~4.64/22.45/105.0.
run revert_512 timeout 2400 python tools/measure_step.py
run revert_1024 timeout 3600 python tools/measure_step.py --size 1024
run revert_2048 timeout 3600 python tools/measure_step.py --size 2048 --chunk 20

# 2. pool1 'slice' on top of the revert.
run revert_pool_slice_512 timeout 2400 python tools/measure_step.py \
    --s2d-pool slice
run revert_pool_slice_1024 timeout 3600 python tools/measure_step.py \
    --size 1024 --s2d-pool slice
run revert_pool_slice_2048 timeout 3600 python tools/measure_step.py \
    --size 2048 --chunk 20 --s2d-pool slice

echo "done; results in $OUT" >&2

#!/bin/bash
# Round-4 part 12: STYLE_FOLD A/B on the post-unfreeze source.
# The unfreeze batch (transfer.py prime-ordering fix + objective.py
# STYLE_FOLD flag) shifts traced line numbers, so the baseline arms
# re-run with the flag OFF on the SAME source — the A/B is
# compile-cache-fair in both directions. Fresh process per arm.
set -u
cd /root/repo
OUT=tools/hw_round4_results.jsonl
run() {
    local label=$1; shift
    echo "=== $label: $*" >&2
    local line
    line=$("$@" 2>/dev/null | tail -1)
    [ -n "$line" ] && echo "{\"phase\": \"$label\", \"result\": $line}" >> "$OUT" \
        || echo "{\"phase\": \"$label\", \"result\": null}" >> "$OUT"
}
timeout 300 python3 -c "import jax; jax.devices()" >/dev/null 2>&1 || exit 3

run foldbase_512 timeout 5400 python tools/measure_step.py --size 512 \
    --precision bfloat16 --chunk 60 --no-style-fold
run fold_512 timeout 5400 python tools/measure_step.py --size 512 \
    --precision bfloat16 --chunk 60 --style-fold
run foldbase_1024 timeout 5400 python tools/measure_step.py --size 1024 \
    --precision bfloat16 --chunk 60 --no-style-fold
run fold_1024 timeout 5400 python tools/measure_step.py --size 1024 \
    --precision bfloat16 --chunk 60 --style-fold
run foldbase_2048 timeout 5400 python tools/measure_step.py --size 2048 \
    --precision bfloat16 --chunk 20 --no-style-fold
run fold_2048 timeout 5400 python tools/measure_step.py --size 2048 \
    --precision bfloat16 --chunk 20 --style-fold
# The resident regime (2048 chunk-60) — the fold must also not regress it.
run foldbase_2048c60 timeout 5400 python tools/measure_step.py --size 2048 \
    --precision bfloat16 --chunk 60 --no-style-fold
run fold_2048c60 timeout 5400 python tools/measure_step.py --size 2048 \
    --precision bfloat16 --chunk 60 --style-fold
echo "part 12 done" >&2

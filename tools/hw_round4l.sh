#!/bin/bash
# Round-4 part 13: end-of-round finalization AFTER the part-12 verdict
# (and any in-place STYLE_FOLD default flip). Confirmation arms on the
# SHIPPED defaults at all three sizes (no flags — exercises exactly what
# a user gets and what the driver will compile), then one full bench.py
# to warm `.jax_cache/` for the driver's end-of-round run. After this
# queue drains, traced sources are FROZEN (CLAUDE.md end-of-round
# discipline).
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

run default_512 timeout 3600 python tools/measure_step.py --size 512 \
    --precision bfloat16 --chunk 60
run default_1024 timeout 3600 python tools/measure_step.py --size 1024 \
    --precision bfloat16 --chunk 60
run default_2048 timeout 3600 python tools/measure_step.py --size 2048 \
    --precision bfloat16 --chunk 20
run bench_final3 timeout 14400 python bench.py
echo "part 13 done" >&2

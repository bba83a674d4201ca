#!/bin/bash
# Round-4 part 11: frozen-source measurement arms ahead of the unfreeze
# batch. (a) parity-f32 at 1024/2048 completes the precision matrix
# (f32 parity was only ever measured at 512: 19.324 ms); (b) a 3072px
# bf16 envelope probe (2560 fits without remat at 147 ms; 3840 OOMs —
# where between is the wall?); (c) fresh profiler traces at 512/1024 on
# the FINAL round-4 defaults so the copy budget that guides the unfreeze
# batch reflects BF16_HISTORY + gated resident, not the feed-only source
# it was last measured on (docs/ROUND4.md part 2).
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

# (c) first — cheapest (warm cache), and the traces gate the next batch.
run trace_1024_final timeout 3600 python tools/measure_step.py --size 1024 \
    --precision bfloat16 --chunk 60 --keep-trace /tmp/trace_1024_final
run trace_512_final timeout 3600 python tools/measure_step.py --size 512 \
    --precision bfloat16 --chunk 60 --keep-trace /tmp/trace_512_final
run trace_2048_final timeout 3600 python tools/measure_step.py --size 2048 \
    --precision bfloat16 --chunk 20 --keep-trace /tmp/trace_2048_final

# (a) parity-f32 ladder (fresh compiles expected).
run f32_1024 timeout 5400 python tools/measure_step.py --size 1024 \
    --precision float32 --chunk 60
run f32_2048 timeout 5400 python tools/measure_step.py --size 2048 \
    --precision float32 --chunk 20

# (b) envelope: 3072px bf16, no remat first, conv remat as fallback.
run env_3072 timeout 5400 python tools/measure_step.py --size 3072 \
    --precision bfloat16 --chunk 10
run env_3072_remat timeout 5400 python tools/measure_step.py --size 3072 \
    --precision bfloat16 --chunk 10 --remat conv
echo "part 11 done" >&2

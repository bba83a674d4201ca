#!/bin/bash
# Round-4 part 15: the bf16+polish quality/speed point (the CLI --polish
# flow measured as three arms: f32 parity, bf16, bf16 + P polish iters).
# Records each arm's f32-objective final loss, per-phase walls, and the
# fraction of the bf16 quality gap the polish recovers. float32_fast
# polish (the default) at 512/1024; a parity-f32 polish arm at 512 pins
# the exact-math variant.
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

run polish_512 timeout 3600 python tools/measure_polish.py \
    --size 512 --iters 240 --polish 60
run polish_512_f32 timeout 3600 python tools/measure_polish.py \
    --size 512 --iters 240 --polish 60 --polish-precision float32
run polish_1024 timeout 5400 python tools/measure_polish.py \
    --size 1024 --iters 240 --polish 60
# The serving analog through the real tier: bf16 ladder then the
# float32_fast tail, ending at the session's self-pause (wall includes
# the polish respawn + any residual compile).
run serve_polish_512 timeout 3600 python tools/measure_serving.py \
    --converge --size 512 --ladder 120 --polish 60 --seconds 900
echo "part 15 done" >&2

#!/bin/bash
# Round-4 part 16: CORRECTED polish arms. The part-15 rows (polish_512,
# polish_512_f32, polish_1024, serve_polish_512) are invalid: the polish
# engine computed fresh first-eval norms AT the bf16 result, so it
# optimized (and reported) a differently-normalized objective — the
# "bf16_delta 25x" rows are incommensurate, not a quality signal. The
# feature now inherits the main run's norm state (cli.py polish block,
# serving respawn SetImages norms=, pooled cross-precision migrate) and
# measure_polish.py cross-evaluates every arm under the f32 reference
# engine's init-anchored objective (the bench_bf16_quality convention).
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

run polish_512_v2 timeout 3600 python tools/measure_polish.py \
    --size 512 --iters 240 --polish 60
run polish_512_f32_v2 timeout 3600 python tools/measure_polish.py \
    --size 512 --iters 240 --polish 60 --polish-precision float32
run polish_1024_v2 timeout 5400 python tools/measure_polish.py \
    --size 1024 --iters 240 --polish 60
run serve_polish_512_v2 timeout 3600 python tools/measure_serving.py \
    --converge --size 512 --ladder 120 --polish 60 --seconds 900
echo "part 16 done" >&2

#!/bin/bash
# Round-5 part 1: the measurement debt the round-4 verdict names.
#  1. SERVING arms first (they import serve/*, which is then free for the
#     phase-machinery refactor while the engine-side arms run):
#     serving-ladder converge loss claims re-measured on the post-norm-fix
#     source, and the serving polish arm.
#  2. polish *_v2 arms (hw_round4o.sh never ran): the corrected polish
#     measurement — the feature now inherits the main run's norm state, and
#     measure_polish.py cross-evaluates every arm under the f32 reference
#     engine's init-anchored objective.
#  3. north-star plateau calibration (3 reps, per-rung iteration counts) —
#     input to bench.py's fixed-schedule rewrite (verdict item 2).
set -u
cd /root/repo
OUT=tools/hw_round5_results.jsonl
run() {
    local label=$1; shift
    echo "=== $label: $*" >&2
    local line
    line=$("$@" 2>/dev/null | tail -1)
    [ -n "$line" ] && echo "{\"phase\": \"$label\", \"result\": $line}" >> "$OUT" \
        || echo "{\"phase\": \"$label\", \"result\": null}" >> "$OUT"
}
timeout 300 python3 -c "import jax; jax.devices()" >/dev/null 2>&1 || exit 3

# 1. Serving arms (warm; the cold/warm split was answered in round 4).
run ladder_single_r5 timeout 2400 python tools/measure_serving.py \
    --size 1024 --converge --latency-target 2.0 --seconds 300
run ladder_ladder_r5 timeout 3600 python tools/measure_serving.py \
    --size 1024 --converge --ladder 120 --latency-target 2.0 --seconds 300
run serve_polish_512_v2 timeout 3600 python tools/measure_serving.py \
    --converge --size 512 --ladder 120 --polish 60 --seconds 900
echo "SERVING ARMS DONE (serve/ now free to edit)" >&2
date +%s > /tmp/serving_arms_done

# 2. Corrected polish arms (supersede the invalidated part-15 rows).
run polish_512_v2 timeout 3600 python tools/measure_polish.py \
    --size 512 --iters 240 --polish 60
run polish_512_f32_v2 timeout 3600 python tools/measure_polish.py \
    --size 512 --iters 240 --polish 60 --polish-precision float32
run polish_1024_v2 timeout 5400 python tools/measure_polish.py \
    --size 1024 --iters 240 --polish 60

# 3. North-star plateau calibration for the fixed-schedule rewrite.
run ns_calibrate timeout 5400 python tools/calibrate_ns.py --reps 3

echo "round-5 part 1 done" >&2
date +%s > /tmp/hw5a_done

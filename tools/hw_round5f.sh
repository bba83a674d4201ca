#!/bin/bash
# Round-5 part 6: final serving numbers on the shipped defaults, after
# hw_round5e warmed the base-step programs.
#  - ladder_ladder_final x2: the part-4 arm burned its whole window on
#    post-flip cold compiles (time_to_first_iterate 1113 s). First run
#    warms every rung's serving programs, second is the measurement.
#  - t_first_warm: cold-boot time-to-first-iterate on a WARM cache (the
#    VERDICT r4 #5 done-bar: <= 10 s).
#  - serve polish arm on the shipped defaults (float32 polish).
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

run ladder_ladder_warmup timeout 3600 python tools/measure_serving.py \
    --size 1024 --converge --ladder 120 --latency-target 2.0 --seconds 600
run ladder_ladder_final timeout 3600 python tools/measure_serving.py \
    --size 1024 --converge --ladder 120 --latency-target 2.0 --seconds 600

run t_first_warm timeout 1800 python tools/measure_serving.py \
    --tier app --size 512 --latency-target 2.0 --seconds 45

run serve_polish_final timeout 3600 python tools/measure_serving.py \
    --converge --size 512 --ladder 120 --polish 60 --seconds 900

echo "round-5 part 6 done" >&2
date +%s > /tmp/hw5f_done

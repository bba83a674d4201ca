#!/bin/bash
# Round-5 part 7: post-restart salvage queue. The 21:37 container restart
# wiped .jax_cache and /tmp done-markers and cut hw_round5e at its first
# arm; hw_round5f never started. This queue runs AFTER the cache-warming
# bench_final5 run, in value order for whatever wall clock remains:
#  - step2048_final: the ONLY shipped default without a post-flip hardware
#    confirm — conv.py MAX_PIXELS=300k must return 2048px to ~88.7 ms/step
#    (the uncapped fused kernel regressed it to 102.7).
#  - step512/1024_final: no-flag confirms of the PALLAS_CONV flip (expect
#    ~3.52 / ~15.37 ms — same programs as the *_pconv_v2 arms).
#  - t_first_warm: cold-boot time-to-first-iterate on the now-warm cache
#    (VERDICT r4 #5 done-bar: <= 10 s; cache was wiped, so the bench run
#    plus step512_final are the warmers).
#  - pooled_4x256: fused-kernel no-regression check through the pooled tier.
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

run step2048_final timeout 2400 python tools/measure_step.py --size 2048 \
    --chunk 20
run step512_final timeout 1800 python tools/measure_step.py --size 512
run step1024_final timeout 1800 python tools/measure_step.py --size 1024

run t_first_warm timeout 900 python tools/measure_serving.py \
    --tier app --size 512 --latency-target 2.0 --seconds 45

run pooled_4x256 timeout 1800 python tools/measure_serving.py --tier pool \
    --size 256 --lanes 4 --seconds 120

echo "round-5 part 7 done" >&2
date +%s > /tmp/hw5g_done

#!/bin/bash
# Round-4 part 14: pipelined-dispatch wall-clock A/B + re-warm.
# bench.py's throughput/north-star loops now dispatch chunks depth-2
# (begin_steps chains on device; the collect round trip overlaps the
# next chunk's compute). The compiled programs are UNCHANGED — this is
# a measurement-loop fix — but bench.py's line numbers shifted, so the
# full run at the end re-warms `.jax_cache/` for the driver.
#
# Arms: sync (BENCH_PIPELINE=1, the round-1..4 loop) vs pipelined
# (default depth 2) headline-only on the same link, then the full
# bench.py on the shipped defaults (the new record + the cache warm).
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

# Headline-only arms (quality/video/northstar off): f32 + bf16 phases.
run bench_sync_arm timeout 7200 env BENCH_PIPELINE=1 BENCH_QUALITY=0 \
    BENCH_VIDEO=0 BENCH_NORTHSTAR=0 python bench.py
run bench_pipe_arm timeout 7200 env BENCH_PIPELINE=2 BENCH_QUALITY=0 \
    BENCH_VIDEO=0 BENCH_NORTHSTAR=0 python bench.py
# Full bench on shipped defaults: the round-4 record + the cache warm.
run bench_final4 timeout 14400 python bench.py
echo "part 14 done" >&2

#!/bin/bash
# Round-4 hardware queue, part 1: the two new step-level optimizations
# (BF16_FEED bf16-native loss feed; S2D_RESIDENT iterate) measured as
# fresh-process A/B arms at 512/1024/2048px bf16 against the shipped
# round-3 defaults, plus the float32_fast probe (VERDICT r3 #8).
# Defaults flip only on wins at every size (round-3 flip discipline);
# traces kept at 1024 for the copy-budget audit.
set -u
cd "$(dirname "$0")/.."
OUT=tools/hw_round4_results.jsonl

probe() {
    timeout 300 python3 -c "import jax; print(jax.devices())" >/dev/null 2>&1
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

# 0. Baseline arms on today's link (defaults as committed: feed/resident off).
run base_512 timeout 2400 python tools/measure_step.py
run base_1024 timeout 3600 python tools/measure_step.py --size 1024
run base_2048 timeout 3600 python tools/measure_step.py --size 2048 --chunk 20

# 1. BF16_FEED arms.
run feed_512 timeout 2400 python tools/measure_step.py --bf16-feed
run feed_1024 timeout 3600 python tools/measure_step.py --size 1024 --bf16-feed \
    --keep-trace /tmp/trace_1024_feed
run feed_2048 timeout 3600 python tools/measure_step.py --size 2048 --chunk 20 \
    --bf16-feed

# 2. S2D_RESIDENT arms (on top of the default feed=off).
run resident_512 timeout 2400 python tools/measure_step.py --s2d-resident
run resident_1024 timeout 3600 python tools/measure_step.py --size 1024 \
    --s2d-resident
run resident_2048 timeout 3600 python tools/measure_step.py --size 2048 \
    --chunk 20 --s2d-resident

# 3. Combined (the likely shipping config if both win).
run feed_resident_512 timeout 2400 python tools/measure_step.py --bf16-feed \
    --s2d-resident
run feed_resident_1024 timeout 3600 python tools/measure_step.py --size 1024 \
    --bf16-feed --s2d-resident --keep-trace /tmp/trace_1024_feedres
run feed_resident_2048 timeout 3600 python tools/measure_step.py --size 2048 \
    --chunk 20 --bf16-feed --s2d-resident

# 4. float32_fast probe: vs parity f32 at 512 (the headline size).
run f32_512 timeout 3600 python tools/measure_step.py --precision float32
run f32fast_512 timeout 3600 python tools/measure_step.py \
    --precision float32_fast
run f32fast_1024 timeout 3600 python tools/measure_step.py --size 1024 \
    --precision float32_fast

echo "done; results in $OUT" >&2

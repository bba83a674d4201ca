#!/bin/bash
# Round-4 hardware queue, part 5 (probe): does S2D_RESIDENT win at 2048px
# when the chunk is long enough to amortize the boundary conversion?
# (Part 1 measured it -0.9% at chunk 20; the conversion is per-chunk.)
# If it wins at chunk 60 everywhere, the flag ships gated on scan length.
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

run res60_base_2048 timeout 3600 python tools/measure_step.py --size 2048 \
    --chunk 60
run res60_resident_2048 timeout 3600 python tools/measure_step.py \
    --size 2048 --chunk 60 --s2d-resident
run res60_resident_512 timeout 2400 python tools/measure_step.py \
    --s2d-resident
run res60_resident_1024 timeout 3600 python tools/measure_step.py \
    --size 1024 --s2d-resident

echo "done; results in $OUT" >&2

#!/bin/bash
# Round-4 hardware queue, part 3: the BF16_HISTORY A/B (bf16-stored L-BFGS
# curvature pairs) on the shipped round-4 defaults, then the full-shape 4K
# spatial-sharding dryrun on the virtual CPU mesh (safe here: no wall-clock
# serving measurement is in flight).
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

run hist_512 timeout 2400 python tools/measure_step.py --bf16-history
run hist_1024 timeout 3600 python tools/measure_step.py --size 1024 \
    --bf16-history
run hist_2048 timeout 3600 python tools/measure_step.py --size 2048 \
    --chunk 20 --bf16-history

# Full-shape 4K sharded dryrun (CPU virtual mesh; ~minutes on one core).
echo "=== dryrun_4k" >&2
timeout 5400 python tools/dryrun_4k.py --out MULTICHIP_4K_r04.json \
    && echo "dryrun_4k OK" >&2 || echo "dryrun_4k FAILED rc=$?" >&2

echo "done; results in $OUT" >&2

#!/bin/bash
# Round-5 part 2: the conv wall (VERDICT r4 #3).
# The PALLAS_CONV flag's introduction shifted vgg19.py line numbers, so
# fresh BASELINE arms run in the same compile-cache generation as the
# pallas arms (the round-4 part-12 discipline). The chained microbench
# runs first: kernel-level fwd/bwd ratios vs XLA at the 1024px conv mix.
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

run pconv_micro timeout 7200 python tools/measure_pallas_conv.py --iters 60

# Whole-step A/B, fresh process per arm (house discipline).
run step512_base  timeout 3600 python tools/measure_step.py --size 512
run step512_pconv timeout 3600 python tools/measure_step.py --size 512 \
    --pallas-conv
run step1024_base  timeout 3600 python tools/measure_step.py --size 1024
run step1024_pconv timeout 3600 python tools/measure_step.py --size 1024 \
    --pallas-conv
run step2048_base  timeout 3600 python tools/measure_step.py --size 2048 \
    --chunk 20
run step2048_pconv timeout 3600 python tools/measure_step.py --size 2048 \
    --chunk 20 --pallas-conv

echo "round-5 part 2 done" >&2
date +%s > /tmp/hw5b_done

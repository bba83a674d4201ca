#!/usr/bin/env python3
"""Measures the bf16 + f32-polish quality/speed point at a given size.

Three arms from the same init (golden_gate x starry_night, random VGG
params — throughput and relative loss deltas are weight-independent):

  1. f32 parity: N iterations (the quality reference).
  2. bf16: N iterations (the speed headline).
  3. bf16 N iterations + P polish iterations at --polish-precision,
     warm-started from arm 2's iterate (the CLI --polish flow).

Reports each arm's final loss UNDER THE F32 OBJECTIVE (commensurate norm
state, the bench_bf16_quality convention), walls per phase, and the
fraction of the bf16->f32 loss gap the polish recovers:

  python tools/measure_polish.py --size 512 --iters 240 --polish 60
"""

import argparse
import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--size', type=int, default=512)
    p.add_argument('--iters', type=int, default=240)
    p.add_argument('--polish', type=int, default=60)
    p.add_argument('--polish-precision', default='float32_fast',
                   choices=('float32', 'float32_fast'))
    p.add_argument('--chunk', type=int, default=60)
    p.add_argument('--platform', default='')
    args = p.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update('jax_platforms', args.platform)
    jax.config.update('jax_compilation_cache_dir', str(ROOT / '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    import numpy as np
    from PIL import Image

    import bench
    from style_transfer2_tpu.models import random_params
    from style_transfer2_tpu.utils import resize_to_fit

    params = random_params(0)
    content = np.uint8(resize_to_fit(
        Image.open(ROOT / 'examples/golden_gate.jpg').convert('RGB'),
        args.size))
    style = np.uint8(resize_to_fit(
        Image.open(ROOT / 'examples/starry_night.jpg').convert('RGB'),
        args.size))
    rng = np.random.RandomState(0)
    init = rng.uniform(0, 255, content.shape).astype(np.uint8)

    def run(st, n):
        """n iterations in --chunk-sized fused dispatches; returns wall
        seconds after an explicit start-of-run sync (compile excluded by
        the first chunk's own warmup being included — walls here compare
        arms, not headline throughput)."""
        t0 = time.perf_counter()
        done = 0
        while done < n:
            k = min(args.chunk, n - done)
            st.run_steps(k, fetch_image=False)
            done += k
        return time.perf_counter() - t0

    # Arm 1: f32 parity reference. Kept alive as the EVALUATION ORACLE:
    # its first-eval norms are anchored at the shared init, so losses
    # evaluated through it are commensurate across arms (the
    # bench_bf16_quality convention — a fresh engine would re-anchor its
    # norms at whatever image it evaluates first, inflating the numbers).
    st32 = bench._make_engine(params, content, style, init, 'float32')
    wall32 = run(st32, args.iters)
    loss32 = st32.traces[-1].data['loss']

    def f32_eval(image):
        """Loss of `image` under st32's (init-anchored) objective: set_input
        keeps the norm cache and re-primes, so the next dispatch's first
        trace row is the f32 loss AT `image`. Reuses arm 1's compiled
        chunk program (a shorter dispatch would cost a fresh compile)."""
        n_before = len(st32.traces)
        st32.set_input(image)
        st32.run_steps(args.chunk, fetch_image=False)
        return st32.traces[n_before].data['loss']

    # Arm 2: bf16.
    st16 = bench._make_engine(params, content, style, init, 'bfloat16')
    wall16 = run(st16, args.iters)
    img16 = st16.snapshot()

    # Arm 3: polish from the bf16 iterate — the CLI --polish flow: fresh
    # engine at the polish precision, warm-started through the lossless
    # snapshot -> preprocess round trip, INHERITING the main run's
    # first-eval norms so the tail continues the same normalized objective
    # (cli.py polish block).
    stp = bench._make_engine(params, content, style, init.copy(),
                             args.polish_precision)
    stp.set_input(img16)
    stp.norm_vals.update(
        {k: np.float32(v) for k, v in st16.norm_vals.items()})
    stp.norm_set.update(
        {k: np.bool_(bool(v)) for k, v in st16.norm_set.items()})
    del st16
    wall_polish = run(stp, args.polish)
    img_polished = stp.snapshot()
    del stp

    # Commensurate cross-evals, both under arm 1's objective.
    loss16_eval = f32_eval(img16)
    loss_polished = f32_eval(img_polished)

    gap = loss16_eval - loss32
    recovered = (loss16_eval - loss_polished) / gap if gap > 0 else None
    out = {
        'size': args.size, 'iters': args.iters, 'polish_iters': args.polish,
        'polish_precision': args.polish_precision,
        'f32_loss': float(loss32), 'f32_wall_s': round(wall32, 2),
        'bf16_wall_s': round(wall16, 2),
        'bf16_loss_f32eval': float(loss16_eval),
        'polished_loss_f32eval': float(loss_polished),
        'polish_wall_s': round(wall_polish, 2),
        'bf16_delta': round(float(loss16_eval / loss32 - 1), 5),
        'polished_delta': round(float(loss_polished / loss32 - 1), 5),
        'gap_recovered': round(float(recovered), 4)
        if recovered is not None else None,
    }
    print(json.dumps(out), flush=True)
    return 0


if __name__ == '__main__':
    sys.exit(main())

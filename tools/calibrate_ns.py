#!/usr/bin/env python3
"""Calibrate the north-star's FIXED iteration schedule (round-5 verdict
item 2: the plateau detector's chunk-to-chunk tol decision is chaotic near
threshold — bench_final2..4 ran 960/960/1260 multi-scale iterations and the
official artifact swung 24.5-58 s on frozen source).

Runs the plateau-mode north star N times and logs PER-RUNG iteration counts
and losses, so bench.py can ship a deterministic per-rung schedule (median
of the reps) and measure the ENGINE: wall at fixed work, best-of-R walls.

Prints one JSON line: per-rung medians + per-rep detail.
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

HERE = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(HERE))

import bench  # noqa: E402  (repo-root bench.py)


def one_rep(params, precision):
    from PIL import Image
    from style_transfer2_tpu.utils import resize_to_fit, scales

    content_full = Image.open(
        HERE / 'examples/golden_gate.jpg').convert('RGB')
    style = np.uint8(resize_to_fit(
        Image.open(HERE / 'examples/starry_night.jpg').convert('RGB'),
        bench.NORTHSTAR_SIZE))
    ladder = sorted(max(hw) for hw in scales(
        (bench.NORTHSTAR_SIZE, bench.NORTHSTAR_SIZE),
        min_size=bench.NS_MIN_SIZE))

    def content_at(size):
        return np.uint8(resize_to_fit(content_full, size))

    rng = np.random.RandomState(0)

    # Single-scale.
    c1024 = content_at(bench.NORTHSTAR_SIZE)
    st = bench._make_engine(params, c1024, style,
                            rng.uniform(0, 255, c1024.shape).astype(np.uint8),
                            precision)
    st.run_steps(bench.NS_CHUNK, fetch_image=False)  # warm compile
    st.reset()
    st = bench._make_engine(params, c1024, style,
                            rng.uniform(0, 255, c1024.shape).astype(np.uint8),
                            precision)
    t0 = time.perf_counter()
    it_s, loss_s = bench._run_to_plateau(st)
    single = dict(iters=it_s, loss=float(loss_s),
                  s=round(time.perf_counter() - t0, 1))

    # Multi-scale with per-rung logging.
    c = content_at(ladder[0])
    st = bench._make_engine(params, c, style,
                            rng.uniform(0, 255, c.shape).astype(np.uint8),
                            precision)
    rungs = []
    t0 = time.perf_counter()
    for i, size in enumerate(ladder):
        t1 = time.perf_counter()
        it, loss = bench._run_to_plateau(st)
        rungs.append(dict(size=size, iters=it, loss=float(loss),
                          s=round(time.perf_counter() - t1, 1)))
        if i + 1 < len(ladder):
            nxt = content_at(ladder[i + 1])
            st.resample_input(nxt.shape[:2])
            st.set_content(nxt)
    multi_s = round(time.perf_counter() - t0, 1)
    return dict(ladder=ladder, single=single, rungs=rungs, multi_s=multi_s)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--reps', type=int, default=3)
    p.add_argument('--precision', default='bfloat16')
    args = p.parse_args()

    from style_transfer2_tpu.models.weights import resolve_params
    import jax
    jax.config.update('jax_compilation_cache_dir',
                      str(HERE / '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    params = resolve_params('auto', HERE)

    reps = []
    for r in range(args.reps):
        rep = one_rep(params, args.precision)
        bench.log('rep %d: single %s  rungs %s (multi %.1fs)'
                  % (r, rep['single'],
                     [(g['size'], g['iters']) for g in rep['rungs']],
                     rep['multi_s']))
        reps.append(rep)

    ladder = reps[0]['ladder']
    med_single = int(np.median([r['single']['iters'] for r in reps]))
    med_rungs = [int(np.median([r['rungs'][i]['iters'] for r in reps]))
                 for i in range(len(ladder))]
    print(json.dumps(dict(
        precision=args.precision,
        ladder=ladder,
        single_iters_median=med_single,
        rung_iters_median=med_rungs,
        reps=reps)))


if __name__ == '__main__':
    main()

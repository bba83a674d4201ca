#!/usr/bin/env python3
"""Microbenchmark: fused Pallas conv3x3+bias+ReLU vs XLA's conv lowering,
over the real VGG conv mix of the 1024px bf16 step (VERDICT r4 #3).

FOUR programs total (impl x direction), each a K-iteration on-device
lax.scan whose body runs EVERY shape in the mix once, chained through a
data dependence so nothing hoists. One remote compile per program (the
per-program-per-shape variant paid ~10+ min of remote compile for each of
20 programs). The XLA arms time conv + bias + ReLU **with the separate
elementwise pass XLA actually pays** (the epilogue can't fuse into the
conv custom call) — the production alternative being displaced; bwd arms
time the full vjp (fwd + masked input-gradient) both sides.

Prints one JSON line per (impl, direction) with the chain ms/iter, plus a
final summary line with the pallas/xla ratios.
"""

import argparse
import json
import sys
import time
from pathlib import Path

HERE = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(HERE))

import numpy as np  # noqa: E402

# The conv mix of a 1024px bf16 step, one entry per distinct
# (grid, C_in, C_out) — counts fold repeated layers (conv3_2..4 = 3x etc.)
# so the chain's FLOP mix matches the step's.
MIX_1024 = [
    ('b1s2d_conv1_2', (512, 512, 256, 256), 1),
    ('conv2_1', (512, 512, 64, 128), 1),
    ('conv2_2', (512, 512, 128, 128), 1),
    ('conv3_1', (256, 256, 128, 256), 1),
    ('conv3_x', (256, 256, 256, 256), 3),
    ('conv4_1', (128, 128, 256, 512), 1),
    ('conv4_x', (128, 128, 512, 512), 3),
    ('conv5_1', (64, 64, 512, 512), 1),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--iters', type=int, default=60)
    p.add_argument('--dtype', default='bfloat16')
    p.add_argument('--reps', type=int, default=3,
                   help='timed repeats; best is reported')
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', str(HERE / '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    from style_transfer2_tpu.ops.pallas.conv import (
        conv3x3_bias_relu, supported)

    dtype = jnp.dtype(args.dtype)
    K = args.iters
    eps = dtype.type(1e-6)

    def xla_fwd(x, w, b):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=x.dtype)
        return jnp.maximum(y + b, 0.0)

    rng = np.random.RandomState(0)
    shapes, weights, counts = [], [], []
    total_flops = 0
    for label, (h, w_, c_in, c_out), cnt in MIX_1024:
        x = jnp.asarray(rng.randn(1, h, w_, c_in), dtype)
        w = jnp.asarray(rng.randn(3, 3, c_in, c_out) * 0.05, dtype)
        b = jnp.asarray(rng.randn(c_out) * 0.05, dtype)
        g = jnp.asarray(rng.randn(1, h, w_, c_out), dtype)
        if not supported(x.shape, w.shape):
            print(json.dumps({'label': label, 'skipped': 'unsupported'}),
                  flush=True)
            continue
        shapes.append((label, x, g))
        weights.append((w, b))
        counts.append(cnt)
        total_flops += cnt * 2 * 9 * h * w_ * c_in * c_out

    def chain_fwd(f):
        def body(xs, _):
            out = []
            for (label, _, _), (w, b), x, cnt in zip(shapes, weights, xs,
                                                     counts):
                x2 = x
                for _i in range(cnt):
                    y = f(x2, w, b)
                    x2 = x2 + y[..., :x.shape[-1]].astype(x.dtype) * eps
                out.append(x2)
            return tuple(out), ()
        return body

    def chain_bwd(f):
        def body(xs, _):
            out = []
            for (label, _, g), (w, b), x, cnt in zip(shapes, weights, xs,
                                                     counts):
                x2 = x
                for _i in range(cnt):
                    _, vjp = jax.vjp(lambda x_: f(x_, w, b), x2)
                    (dx,) = vjp(g)
                    x2 = x2 + dx * eps
                out.append(x2)
            return tuple(out), ()
        return body

    init = tuple(x for _, x, _ in shapes)
    results = {}
    for impl, f in (('xla', xla_fwd), ('pallas', conv3x3_bias_relu)):
        for direction, maker in (('fwd', chain_fwd), ('bwd', chain_bwd)):
            body = maker(f)

            @jax.jit
            def run(init, body=body):
                out, _ = jax.lax.scan(body, init, None, length=K)
                return out

            t0 = time.perf_counter()
            r = run(init)
            jax.block_until_ready(r)
            compile_s = time.perf_counter() - t0
            best = float('inf')
            for _rep in range(args.reps):
                t0 = time.perf_counter()
                r = run(init)
                jax.block_until_ready(r)
                best = min(best, (time.perf_counter() - t0) / K)
            eff = total_flops * (1 if direction == 'fwd' else 2)
            results[(impl, direction)] = best
            print(json.dumps({
                'impl': impl, 'dir': direction,
                'chain_ms_per_iter': round(best * 1e3, 4),
                'tflops': round(eff / best / 1e12, 1),
                'compile_s': round(compile_s, 1),
            }), flush=True)

    summary = {'mix': '1024px', 'iters': K}
    for d in ('fwd', 'bwd'):
        if ('xla', d) in results and ('pallas', d) in results:
            summary['pallas_over_xla_' + d] = round(
                results[('pallas', d)] / results[('xla', d)], 4)
    print(json.dumps(summary), flush=True)


if __name__ == '__main__':
    main()

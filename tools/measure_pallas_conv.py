#!/usr/bin/env python3
"""Microbenchmark: fused Pallas conv3x3+bias+ReLU vs XLA's conv lowering,
at the real VGG shapes of the 1024/2048px bf16 steps (VERDICT r4 #3).

Per shape and direction, times a K-iteration on-device lax.scan in ONE
dispatch (amortizes the ~0.5 s tunnel dispatch) with a data dependence
between iterations so nothing hoists, and reports ms/iter. The XLA arm
times conv + bias + ReLU **plus the separate elementwise pass XLA
actually pays** (the epilogue can't fuse into the conv custom call) —
that is the production alternative being displaced. The bwd arm times
the full vjp at matching cotangents (mask-apply included both sides).

Prints one JSON line per (shape, direction, impl).
"""

import argparse
import functools
import json
import sys
import time
from pathlib import Path

HERE = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(HERE))

import numpy as np  # noqa: E402


# (label, (H, W, C_in, C_out)) — the per-layer grids of a 1024px step
# (block 1 runs in the s2d domain at H/2) and the 2048px block-2 shape.
SHAPES_1024 = [
    ('b1s2d_conv1_2@1024', (512, 512, 256, 256)),
    ('conv2_1@1024', (512, 512, 64, 128)),
    ('conv2_2@1024', (512, 512, 128, 128)),
    ('conv3_x@1024', (256, 256, 256, 256)),
    ('conv4_x@1024', (128, 128, 512, 512)),
    ('conv5_1@1024', (64, 64, 512, 512)),
]
SHAPES_512 = [
    ('conv2_2@512', (256, 256, 128, 128)),
    ('conv3_x@512', (128, 128, 256, 256)),
]
SHAPES_2048 = [
    ('conv2_2@2048', (1024, 1024, 128, 128)),
    ('conv3_x@2048', (512, 512, 256, 256)),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--iters', type=int, default=100)
    p.add_argument('--sizes', default='1024',
                   help='comma list from {512,1024,2048}')
    p.add_argument('--dtype', default='bfloat16')
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', str(HERE / '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    from style_transfer2_tpu.ops.pallas.conv import (
        conv3x3_bias_relu, supported)

    dtype = jnp.dtype(args.dtype)
    K = args.iters
    shapes = []
    for s in args.sizes.split(','):
        shapes += {'512': SHAPES_512, '1024': SHAPES_1024,
                   '2048': SHAPES_2048}[s]

    def xla_fwd(x, w, b):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=x.dtype)
        return jnp.maximum(y + b, 0.0)

    def chain_fwd(f, w, b, c_in):
        """K applications with an iteration-to-iteration data dependence
        (out feeds back into the input's first c_in channels)."""
        def body(x, _):
            y = f(x, w, b)
            x2 = x + y[..., :c_in].astype(x.dtype) * dtype.type(1e-6)
            return x2, ()
        return body

    def chain_bwd(f, w, b, c_in):
        def body(carry, _):
            x, g = carry
            _, vjp = jax.vjp(lambda x_: f(x_, w, b), x)
            (dx,) = vjp(g)
            return (x + dx * dtype.type(1e-6), g), ()
        return body

    rng = np.random.RandomState(0)
    for label, (h, w_, c_in, c_out) in shapes:
        x = jnp.asarray(rng.randn(1, h, w_, c_in), dtype)
        w = jnp.asarray(rng.randn(3, 3, c_in, c_out) * 0.05, dtype)
        b = jnp.asarray(rng.randn(c_out) * 0.05, dtype)
        g = jnp.asarray(rng.randn(1, h, w_, c_out), dtype)
        if not supported(x.shape, w.shape):
            print(json.dumps({'label': label, 'skipped': 'unsupported'}))
            continue
        flops = 2 * 9 * h * w_ * c_in * c_out
        for impl, f in (('xla', xla_fwd), ('pallas', conv3x3_bias_relu)):
            for direction in ('fwd', 'bwd'):
                maker = chain_fwd if direction == 'fwd' else chain_bwd
                body = maker(f, w, b, c_in)
                init = x if direction == 'fwd' else (x, g)

                @jax.jit
                def run(init, body=body):
                    out, _ = jax.lax.scan(body, init, None, length=K)
                    return out

                r = run(init)          # compile + first run
                jax.block_until_ready(r)
                t0 = time.perf_counter()
                r = run(init)
                jax.block_until_ready(r)
                dt = (time.perf_counter() - t0) / K
                eff_flops = flops * (1 if direction == 'fwd' else 2)
                print(json.dumps({
                    'label': label, 'impl': impl, 'dir': direction,
                    'ms_per_iter': round(dt * 1e3, 4),
                    'tflops': round(eff_flops / dt / 1e12, 1),
                }), flush=True)


if __name__ == '__main__':
    main()

"""Fused Pallas kernel for the style-loss branch.

The reference computes, per style layer (worker.py:259-269):
    G      = X^T X / size            (gram_matrix, worker.py:109-114)
    G_diff = G - G_style
    s_grad = (X @ G_diff) * 2 / (C^2 * size)     [NHWC formulation]

As separate XLA ops this writes G to HBM, reads it back, and reads X twice.
This kernel runs a two-phase sequential grid on the TPU core:
  phase 1 (steps 0..T-1):  accumulate G = sum_tiles X_t^T X_t in a VMEM
                           scratch accumulator (MXU matmuls);
  step T:                  rescale, subtract G_style in place, emit G_diff;
  phase 2 (steps T..2T-1): s_grad_t = X_t @ G_diff * scale, streaming X a
                           second time (unavoidable: G must complete first)
                           while G_diff stays resident in VMEM.

Rows are zero-padded to the tile size by the caller wrapper (zero rows
contribute nothing to G and produce zero gradient rows, which are sliced
off). C (the lane dimension) is the feature-channel count (64..512).

Gradient support is unnecessary: the objective injects analytic cotangents
(engine/objective.py), so these outputs are never differentiated through.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_M = 512


def _style_kernel(x_ref, gs_ref, sgrad_ref, gdiff_ref, acc_ref, *,
                  n_tiles, inv_size, grad_scale):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(i < n_tiles)
    def _():
        x = x_ref[:]
        # X_t^T @ X_t on the MXU, f32 accumulation.
        acc_ref[:] += jax.lax.dot_general(
            x, x, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(i == n_tiles)
    def _():
        gd = acc_ref[:] * inv_size - gs_ref[:]
        acc_ref[:] = gd
        gdiff_ref[:] = gd

    @pl.when(i >= n_tiles)
    def _():
        sgrad_ref[:] = jnp.dot(
            x_ref[:], acc_ref[:],
            preferred_element_type=jnp.float32) * grad_scale


def _use_interpret():
    """Interpret mode off-TPU (CPU tests); compiled Mosaic on TPU (the axon
    PJRT plugin reports platform 'TPU v5'-style devices)."""
    try:
        platform = jax.devices()[0].platform.lower()
    except Exception:
        return True
    return not ('tpu' in platform or 'axon' in platform)


@functools.partial(jax.jit, static_argnames=('size',))
def _fused_padded(x_padded, gram_style, size):
    """x_padded: (M_pad, C) with M_pad % TILE_M == 0. size = true c*h*w."""
    m_pad, c = x_padded.shape
    n_tiles = m_pad // TILE_M
    inv_size = 1.0 / float(size)
    grad_scale = 2.0 / (float(c) * float(c) * float(size))

    kernel = functools.partial(_style_kernel, n_tiles=n_tiles,
                               inv_size=inv_size, grad_scale=grad_scale)
    sgrad, gdiff = pl.pallas_call(
        kernel,
        grid=(2 * n_tiles,),
        in_specs=[
            pl.BlockSpec((TILE_M, c), lambda i, n=n_tiles: (i % n, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_M, c), lambda i, n=n_tiles: (i % n, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m_pad, c), jnp.float32),
            jax.ShapeDtypeStruct((c, c), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((c, c), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * m_pad * c * c,
            bytes_accessed=2 * m_pad * c * 4 + 3 * c * c * 4,
            transcendentals=0,
        ),
        interpret=_use_interpret(),
    )(x_padded, gram_style)
    return sgrad, gdiff


def fused_style_branch(feat, gram_style):
    """Fused style branch for an NHWC feature map.

    Args:
      feat: (1, h, w, c) float32 feature map.
      gram_style: (c, c) float32 target Gram matrix.
    Returns:
      (s_grad, gram_diff): s_grad is (1, h, w, c) — the reference
      half-gradient scaled by 2/(c^2 * chw); gram_diff is (c, c).
    """
    _, h, w, c = feat.shape
    m = h * w
    size = m * c
    flat = feat.reshape(m, c).astype(jnp.float32)
    m_pad = -(-m // TILE_M) * TILE_M
    if m_pad != m:
        flat = jnp.pad(flat, ((0, m_pad - m), (0, 0)))
    sgrad, gdiff = _fused_padded(flat, gram_style.astype(jnp.float32), size)
    return sgrad[:m].reshape(1, h, w, c), gdiff


def gram_pallas(feat):
    """Gram matrix via the fused kernel (zero style target); matches
    ops.gram.gram_matrix."""
    if feat.ndim == 4:
        _, h, w, c = feat.shape
    else:
        h, w, c = feat.shape
        feat = feat[None]
    zero = jnp.zeros((c, c), jnp.float32)
    _, gdiff = fused_style_branch(feat, zero)
    return gdiff

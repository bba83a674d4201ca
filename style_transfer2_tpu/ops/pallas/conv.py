"""Fused 3x3 conv + bias + ReLU Pallas kernel, with a masked input-gradient
backward (VERDICT r4 #3: the conv wall).

Why this exists: TPU conv custom calls cannot fuse elementwise epilogues —
at 1024px bf16 the round-4 trace priced the convs at 38.5% of the step and
the ReLU/pool elementwise passes at 11.2% on top, plus ~0.8 ms/step of
dim-reorder copies intrinsic to XLA's conv-BACKWARD lowering
(vgg19.py:119). This kernel attacks the epilogues and the backward
lowering, not the matmuls themselves (XLA's convs run near MXU peak at the
big shapes — docs/ROUND2.md measured ~95% of v5e bf16 peak):

  * forward: 9 shifted MXU matmuls accumulated in f32, bias + ReLU folded
    into the output write — the separate ReLU HBM pass disappears;
  * backward: the input gradient of a 3x3 SAME conv is the SAME kernel
    applied to the cotangent with the spatially-flipped, in/out-transposed
    weights; the ReLU mask (y > 0) multiplies the cotangent on load, in
    VMEM — the separate mask pass AND XLA's transposed-conv reorder copies
    disappear. This workload has NO weight gradients (reference
    worker.py:88-106 backpropagates to the image only), so dw/db are
    structural zeros.

Tiling: 1-D grid over output row-tiles (x batch); the input block is an
all-Element window of th + 2 rows whose start is CLAMPED in-bounds (the
index map pulls i*th - 1 back into the array) — the Pallas pipeline
fetches each tile WITH its 1-row halos, double-buffered, and the kernel
re-aligns the window in VMEM, inserting the SAME-padding zero rows at the
image top/bottom (_halo). W-padding is two sublane-shifted views built in
VMEM (concat with a zero column).
Channels live on lanes; K = C_in per tap, so the kernel is gated to
C_in >= 64 (thin layers keep XLA's im2col lowering).

Two Mosaic lowering constraints shape this design (both reproduced via
jax.export cross-platform lowering, round 5):
  * a spec's dims must be ALL Element or ALL Blocked — so every dim of the
    halo'd input and output specs is an Element (weights/bias are separate
    specs and stay Blocked);
  * the last TWO block dims (W, C) must be 8/128-multiples or span the
    full array — which makes a W-halo (tw + 2 columns) impossible at
    power-of-two widths (tw + 2 is never 0 mod 8), so tiles span full
    rows and only H carries a halo. A 2-D halo variant was built and
    REVERTED for this (git history, round-5 part 4).

Used by models/vgg19.py behind PALLAS_CONV (hardware-A/B gate, default
set by measurement). Interpret mode makes the CPU tests exact.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .style_kernel import _use_interpret

# Row-tile candidates, largest first: th rows of (W, C) per grid step.
_TILE_ROWS = (32, 16, 8, 4, 2, 1)

# Gate: K = C_in per tap; below this the MXU tile padding waste exceeds
# the epilogue savings (conv1_1's K=3 runs at ~2% of peak as 9 matmuls —
# XLA's im2col lowering is strictly better there).
MIN_CIN = 64

# Spatial cap: full-row tiles at >=1-Mpx grids force th=1-2 row tiles
# whose shifted-view copies and grid overhead swamp the epilogue win —
# the round-5 whole-step A/B won -12.8%/-19.0% at 512/1024px (every
# fused shape there is <= 512x512 = 262k px) but LOST 15.8% at 2048px,
# where the only NEW fused shapes were the 1-Mpx block-2 convs
# (hw_round5_results.jsonl step*_pconv rows). Capping at 300k px keeps
# the proven shapes fused everywhere and returns the 1-Mpx layers to
# XLA, so high-res runs keep the win on their interior blocks.
MAX_PIXELS = 300_000

# VMEM budget for the live working set (v5e has ~16 MB more VMEM than
# this; headroom left for Mosaic's own spills and the weight block).
_VMEM_BUDGET = 11 * 2 ** 20


def _pick_tile(h, w, c_in, c_out, itemsize, n_halo_inputs=1):
    """Largest row tile whose working set fits VMEM: the pipeline double-
    buffers each halo'd input and the output block; the kernel body keeps
    the block plus its two W-shifted views and two f32 accumulator
    temporaries alive."""
    for th in _TILE_ROWS:
        if h % th:
            continue
        in_b = (th + 2) * w * c_in * itemsize
        out_b = th * w * c_out * itemsize
        acc_b = th * w * c_out * 4
        live = (3 + 2) * in_b + 2 * (n_halo_inputs - 1) * in_b \
            + 2 * out_b + 2 * acc_b
        if live < _VMEM_BUDGET:
            return th
    return None


def supported(x_shape, w_shape):
    """Whether the fused kernel covers this conv (the caller falls back to
    XLA's lowering otherwise): NHWC 3x3, C_in >= MIN_CIN, grid at most
    MAX_PIXELS, H tileable within the VMEM budget in BOTH directions,
    lane-friendly C_out, and W sublane-aligned: the kernel's
    (rows, W, C) -> (rows*W, C) matmul reshape needs every row to start
    on a sublane boundary — Mosaic's infer-vector-layout rejects the
    shape cast otherwise (seen on device at W=181, the 362px ladder rung
    in the s2d domain: "unsupported shape cast" on vector<8x181x64>).
    16 is the bf16 native sublane tile; every hardware-proven winning
    shape (W in 32..512, all power-of-two) passes it, and unaligned
    grids return to XLA — the measured pre-flip behavior."""
    if len(x_shape) != 4 or len(w_shape) != 4:
        return False
    n, h, w, c_in = x_shape
    kh, kw, wc_in, c_out = w_shape
    return (kh == 3 and kw == 3 and wc_in == c_in
            and c_in >= MIN_CIN and c_out % 128 == 0 and w >= 8
            and w % 16 == 0
            and h * w <= MAX_PIXELS
            and _pick_tile(h, w, c_in, c_out, 2) is not None
            and _pick_tile(h, w, c_out, c_in, 2, 2) is not None)


def _wsize(th, h):
    """Static window height: th + 2 halo rows, capped at the array (the
    single-tile case th == h has no in-bounds halo rows at all)."""
    return min(th + 2, h)


def _offset(i, th, h):
    """The window's clamped start row (same formula as the index map):
    i*th - 1 pulled back into [0, h - wsize]."""
    lo = i * th - 1
    return jnp.clip(lo, 0, max(h - _wsize(th, h), 0))


def _halo(v, th, h):
    """Canonical (th+2, W, C) halo block from the clamped in-bounds window
    (wsize, W, C): re-align by the window's clamp distance, with zero rows
    exactly where the window abuts an image edge (the SAME padding).

    Mosaic rejects the direct formulation (`pl.Element(th+2,
    padding=(1,1))`): the device backend reports "Low padding not
    supported yet" even though the client-side lowering accepts it. And
    in-kernel jax.lax.dynamic_slice is not lowered either — but the clamp
    distance only takes values {0, 1, 2}, so three static row-shifted
    candidates and two selects re-align for free (rows are a non-tiled
    dim)."""
    z = jnp.zeros_like(v[:1])
    if _wsize(th, h) == th:   # single-tile grid: both halo rows are pads
        return jnp.concatenate([z, v, z], axis=0)
    i = pl.program_id(1)
    start = i * th - _offset(i, th, h)   # 0 at the top edge, 1-2 below
    c0 = jnp.concatenate([z, v[:-1]], axis=0)   # top edge: zero halo row
    c2 = jnp.concatenate([v[1:], z], axis=0)    # bottom edge
    return jnp.where(start == 0, c0, jnp.where(start == 2, c2, v))


def _accumulate_taps(v, w_ref, th):
    """sum over the 9 taps: (th+2, W, C_in) halo block x (3, 3, C_in, C_out)
    -> (th, W, C_out) f32."""
    zcol = jnp.zeros_like(v[:, :1])
    shifted = (jnp.concatenate([zcol, v[:, :-1]], axis=1),   # kernel col 0
               v,                                            # kernel col 1
               jnp.concatenate([v[:, 1:], zcol], axis=1))    # kernel col 2
    acc = None
    for dy in range(3):
        for dx in range(3):
            part = jax.lax.dot_general(
                shifted[dx][dy:dy + th], w_ref[dy, dx],
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
    return acc


def _fwd_kernel(x_ref, w_ref, b_ref, o_ref, *, th, h, relu):
    v = _halo(x_ref[0], th, h)
    acc = _accumulate_taps(v, w_ref, th)
    acc = acc + b_ref[0].astype(jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    o_ref[0] = acc.astype(o_ref.dtype)


def _bwd_kernel(g_ref, y_ref, wt_ref, o_ref, *, th, h):
    # dReLU then dConv: mask the cotangent where the forward output was
    # clamped, at the WINDOW rows (g and y ride identical specs, so the
    # positions align), then build the halo block. The compare runs in
    # f32: the v5e Mosaic backend rejects bf16 comparisons ("Target does
    # not support this comparison").
    g = g_ref[0] * (y_ref[0].astype(jnp.float32)
                    > 0.0).astype(g_ref.dtype)
    v = _halo(g, th, h)
    o_ref[0] = _accumulate_taps(v, wt_ref, th).astype(o_ref.dtype)


def _halo_spec(th, h, w, c):
    # All-Element (index maps yield ELEMENT offsets; mixing Element and
    # Blocked dims in one spec is unsupported) and NO padding (the device
    # Mosaic backend rejects low padding): the window start is clamped
    # in-bounds, and the kernel re-aligns in VMEM (_halo).
    return pl.BlockSpec((pl.Element(1), pl.Element(_wsize(th, h)),
                         pl.Element(w), pl.Element(c)),
                        lambda b, i: (b, _offset(i, th, h), 0, 0))


def _weight_spec(w4):
    return pl.BlockSpec((3, 3) + w4.shape[2:], lambda b, i: (0, 0, 0, 0),
                        memory_space=pltpu.VMEM)


def _call(kernel, xs, w4, extra_specs, out_dtype, th, flops):
    """Shared pallas_call plumbing: xs are (N, H, W, C)-shaped halo'd
    inputs, w4 the (3, 3, K, C_out) weights (VMEM-resident, constant),
    extra_specs for trailing small operands (bias)."""
    n, h, w, _ = xs[0].shape
    c_out = w4.shape[3]
    bytes_accessed = sum(int(x.size) * x.dtype.itemsize for x in xs) \
        + int(w4.size) * w4.dtype.itemsize + n * h * w * c_out * 2
    return pl.pallas_call(
        kernel,
        grid=(n, h // th),
        in_specs=([_halo_spec(th, h, w, x.shape[3]) for x in xs]
                  + [_weight_spec(w4)] + extra_specs),
        out_specs=pl.BlockSpec((pl.Element(1), pl.Element(th),
                                pl.Element(w), pl.Element(c_out)),
                               lambda b, i: (b, i * th, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c_out), out_dtype),
        cost_estimate=pl.CostEstimate(flops=flops,
                                      bytes_accessed=bytes_accessed,
                                      transcendentals=0),
        interpret=_use_interpret(),
    )


def _conv_flops(x, c_out):
    return 2 * 9 * int(x.shape[0]) * int(x.shape[1]) * int(x.shape[2]) \
        * int(x.shape[3]) * c_out


def _fwd_call(x, w, b, relu):
    th = _pick_tile(x.shape[1], x.shape[2], x.shape[3], w.shape[3],
                    x.dtype.itemsize)
    kernel = functools.partial(_fwd_kernel, th=th, h=x.shape[1],
                               relu=relu)
    c_out = w.shape[3]
    bias_spec = pl.BlockSpec((1, c_out), lambda b_, i: (0, 0),
                             memory_space=pltpu.VMEM)
    call = _call(kernel, [x], w, [bias_spec], x.dtype, th,
                 _conv_flops(x, c_out))
    return call(x, w, b.reshape(1, -1))


def _bwd_call(g, y, w, in_dtype):
    # Input gradient: conv g with the spatially-flipped, in/out-transposed
    # kernel. The flip is an op on the (3, 3, C_in, C_out) constants —
    # loop-invariant, hoisted out of the step scan by XLA.
    wt = jnp.flip(w, (0, 1)).transpose(0, 1, 3, 2)
    th = _pick_tile(g.shape[1], g.shape[2], g.shape[3], wt.shape[3],
                    g.dtype.itemsize, n_halo_inputs=2)
    kernel = functools.partial(_bwd_kernel, th=th, h=g.shape[1])
    call = _call(kernel, [g, y], wt, [], in_dtype, th,
                 _conv_flops(g, wt.shape[3]))
    return call(g, y, wt)


@jax.custom_vjp
def conv3x3_bias_relu(x, w, b):
    """ReLU(conv3x3_SAME(x, w) + b), NHWC/HWIO, fused epilogue + masked
    backward. x bf16 (or f32), w/b in x's dtype; f32 MXU accumulation."""
    return _fwd_call(x, w, b, relu=True)


def _cvr_fwd(x, w, b):
    y = _fwd_call(x, w, b, relu=True)
    return y, (y, w)


def _cvr_bwd(res, g):
    y, w = res
    dx = _bwd_call(g, y, w, g.dtype)
    # No weight gradients in this workload (image-only optimization);
    # structural zeros are DCE'd by XLA.
    return dx, jnp.zeros_like(w), jnp.zeros(w.shape[3], w.dtype)


conv3x3_bias_relu.defvjp(_cvr_fwd, _cvr_bwd)

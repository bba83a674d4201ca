"""Fixed-step L-BFGS (no line search) as a fixed-shape JAX pytree.

Reference semantics (optimizers.py:49-125) under XLA's static-shape rules:

  * the curvature history (up to n_corr=10 (s, y, s.y) pairs) lives in
    stacked CIRCULAR buffers in HBM — a write cursor (`pos`) plus a valid
    count replace the reference's Python list append/pop, so storing a pair
    writes ONE slice instead of rolling the whole history (the buffers are
    n_corr x image-sized; rolls would move ~100 MB per step at 512px).
    The buffers keep the image's shape appended, (n_corr,) + x.shape.
    A flat (n_corr, x.size) layout was tried to kill a 0.34 ms/step
    scan-carry relayout copy at 1024px and REGRESSED 26-40% on hardware
    (v5e bf16: 4.64 -> 6.52 ms/step at 512px, 22.45 -> 29.8 at 1024,
    105 -> 132 at 2048): the two-loop's dynamic slices over flat buffers
    stopped fusing (constant_dynamic-slice / dynamic-slice_multiply
    fusions went 0.08 -> 4.1 ms/step at 1024) and the ravel/reshape
    boundary forced full-image relayouts each step. The shaped buffers'
    0.34 ms copy is the far cheaper side of that trade;
  * a candidate pair is rejected when s.y <= 1e-10 (optimizers.py:82-83);
  * with an empty history the direction is RMS-normalized:
    p /= sqrt(p.p / p.size) (optimizers.py:100-102); otherwise scaled by
    sy_last / y_last.y_last;
  * ``objective_changed`` clears the history AND the cached (loss, grad)
    (optimizers.py:121-125) — the next step must re-prime via initial_eval;
  * ``resample`` Lanczos-resamples x and clears state (optimizers.py:110-119).

Logical pair order (oldest -> newest) maps to physical slots
(pos - count + j) mod n_corr; the two-loop recursion is a masked lax.scan
over logical offsets with dynamic slot indexing.
"""

import jax
import jax.numpy as jnp

from ..ops.resample import resize_nhwc

N_CORR_DEFAULT = 10
SY_MIN = 1e-10

# BF16_HISTORY: store the (s, y) curvature pairs in bfloat16 (bf16 engine
# mode only — the engine passes history_dtype; float32 parity mode always
# keeps f32 buffers). The two-loop reads the WHOLE history twice per step
# (~350 MB of f32 at 1024px), so halving its width trims real HBM time;
# the s/y values are stored-then-read verbatim (never accumulated in
# bf16), every dot accumulates f32 via preferred_element_type, and sy is
# the dot of the pair AS STORED (store_curvature_pair — computing it
# pre-rounding admitted sign-inconsistent pairs that diverged to NaN).
# Hardware: ON — 4.039/19.787/89.849 ms/step at 512/1024/2048
# (-2.7/-1.7/-3.1%), r4c.
BF16_HISTORY = True
# ...but only at grids with clean evidence: at 256px (65k px) the
# two-loop amplifies the pairs' 2^-8 storage rounding through the early
# ill-conditioned phase and diverges to NaN within 9 iterations — on
# hardware, deterministically, and regardless of the stored-sy
# consistency guard (tools/diag_nan256.py nan_diag + nan_diag_v2); at
# 512px+ (262k px) thousands of measured iterations are clean. Below the
# gate the history stays float32.
BF16_HISTORY_MIN_PIXELS = 160_000


def history_dtype_for(compute_dtype, hw):
    """Storage dtype for fresh curvature buffers: bfloat16 in bf16 speed
    mode on large-enough grids (see BF16_HISTORY_MIN_PIXELS), else None
    (float32 — the parity mode is always float32, golden tests
    untouched). hw is the optimization grid (H, W)."""
    if (BF16_HISTORY and compute_dtype == jnp.bfloat16
            and int(hw[0]) * int(hw[1]) >= BF16_HISTORY_MIN_PIXELS):
        return jnp.bfloat16
    return None


def _vdot(a, b):
    if a.dtype == jnp.float32 and b.dtype == jnp.float32:
        return jnp.vdot(a.ravel(), b.ravel())
    # Mixed/low-precision operands: contract with f32 accumulation without
    # materializing upcast copies.
    return jnp.einsum('i,i->', a.ravel(), b.ravel(),
                      preferred_element_type=jnp.float32)


def init(x, n_corr=N_CORR_DEFAULT, history_dtype=None):
    """Fresh L-BFGS state around the iterate x. The (loss, grad) cache starts
    empty; run initial_eval before the first step. history_dtype (default
    float32) is the storage dtype of the curvature buffers — see
    BF16_HISTORY."""
    x = jnp.asarray(x, jnp.float32)
    hist = jnp.float32 if history_dtype is None else history_dtype
    return {
        'x': x,
        'loss': jnp.float32(0.0),
        'grad': jnp.zeros_like(x),
        'sk': jnp.zeros((n_corr,) + x.shape, hist),
        'yk': jnp.zeros((n_corr,) + x.shape, hist),
        'syk': jnp.zeros((n_corr,), jnp.float32),
        'count': jnp.int32(0),
        'pos': jnp.int32(0),  # next write slot (circular)
    }


def initial_eval(state, opfunc):
    """Primes the (loss, grad) cache — the reference's lazy first evaluation
    at the top of LBFGSOptimizer.step (optimizers.py:64-65)."""
    loss, grad, aux = opfunc(state['x'])
    state = dict(state)
    state['loss'] = loss
    state['grad'] = grad
    return state, loss, aux


def inv_hv(state, p):
    """Two-loop recursion over the masked circular buffer
    (optimizers.py:89-108)."""
    sk, yk, syk = state['sk'], state['yk'], state['syk']
    count, pos = state['count'], state['pos']
    n_corr = sk.shape[0]

    def loop1(p, k):
        # k-th newest pair: physical slot (pos - 1 - k) mod n_corr.
        valid = k < count
        slot = jnp.mod(pos - 1 - k, n_corr)
        s, y, sy = sk[slot], yk[slot], syk[slot]
        sy_safe = jnp.where(valid, sy, 1.0)
        alpha = jnp.where(valid, _vdot(s, p) / sy_safe, 0.0)
        return p - alpha * y, alpha

    p, alphas = jax.lax.scan(loop1, p, jnp.arange(n_corr))

    # Initial Hessian scaling from the newest pair, or RMS normalization when
    # the history is empty (optimizers.py:97-102).
    has_history = count > 0
    newest = jnp.mod(pos - 1, n_corr)
    y_last, sy_last = yk[newest], syk[newest]
    yy = _vdot(y_last, y_last)
    scale_hist = sy_last / jnp.where(yy > 0, yy, 1.0)
    rms = jnp.sqrt(_vdot(p, p) / jnp.float32(p.size))
    scale_rms = 1.0 / jnp.where(rms > 0, rms, 1.0)
    p = p * jnp.where(has_history, scale_hist, scale_rms)

    def loop2(p, j):
        # j-th oldest pair: physical slot (pos - count + j) mod n_corr;
        # its first-loop alpha sits at index count - 1 - j.
        valid = j < count
        slot = jnp.mod(pos - count + j, n_corr)
        s, y, sy = sk[slot], yk[slot], syk[slot]
        sy_safe = jnp.where(valid, sy, 1.0)
        beta = _vdot(y, p) / sy_safe
        alpha = alphas[jnp.maximum(count - 1 - j, 0)]
        return p + jnp.where(valid, alpha - beta, 0.0) * s, None

    p, _ = jax.lax.scan(loop2, p, jnp.arange(n_corr))
    return p


def store_curvature_pair(state, s, y):
    """Appends (s, y, s.y) at the write cursor if s.y > 1e-10
    (optimizers.py:79-87) — one slice write, no roll. Returns
    (sk, yk, syk, count, pos)."""
    n_corr = state['sk'].shape[0]
    pos = state['pos']
    hist = state['sk'].dtype
    if hist != jnp.float32:
        # Low-precision history: the curvature MUST be the dot of the
        # pair AS STORED. bfloat16 rounding moves s.y by up to
        # ~2^-8 * |s||y|, so a near-orthogonal pair accepted on its
        # full-precision s.y can have NEGATIVE stored curvature — the
        # two-loop then divides alphas by a sign-inconsistent rho and the
        # iterate blows up within a few steps (hardware: 256px bf16
        # diverged to NaN at iteration 9 with the pre-rounding sy; f32
        # history was clean — tools/diag_nan256.py, hw_round5 nan_diag).
        # The f32-accumulated dot of bf16 operands is exact per product,
        # so the stored pair's curvature sign is trustworthy; pairs that
        # round to non-positive curvature are rejected by the same
        # absolute guard.
        s, y = s.astype(hist), y.astype(hist)
    sy = _vdot(s, y)
    accept = sy > SY_MIN
    # On reject, rewrite the slot with its current contents (no-op write).
    s_w = jnp.where(accept, s.astype(hist), state['sk'][pos])
    y_w = jnp.where(accept, y.astype(hist), state['yk'][pos])
    sy_w = jnp.where(accept, sy, state['syk'][pos])
    sk = state['sk'].at[pos].set(s_w)
    yk = state['yk'].at[pos].set(y_w)
    syk = state['syk'].at[pos].set(sy_w)
    count = jnp.where(accept, jnp.minimum(state['count'] + 1, n_corr),
                      state['count'])
    pos = jnp.where(accept, jnp.mod(pos + 1, n_corr), pos)
    return sk, yk, syk, count, pos


def step(state, opfunc, step_size):
    """One L-BFGS step (optimizers.py:62-77): move along the approximate
    Newton direction, evaluate, store the new curvature pair. The (loss,
    grad) cache must be primed (initial_eval) first."""
    s = -step_size * inv_hv(state, state['grad'])
    x_new = state['x'] + s

    loss, grad, aux = opfunc(x_new)
    y = grad - state['grad']
    sk, yk, syk, count, pos = store_curvature_pair(state, s, y)

    state_new = {
        'x': x_new,
        'loss': loss,
        'grad': grad,
        'sk': sk,
        'yk': yk,
        'syk': syk,
        'count': count,
        'pos': pos,
    }
    return state_new, loss, aux


def objective_changed(state, n_corr=None):
    """Clears the curvature history and the cached evaluation
    (optimizers.py:121-125). The caller must re-prime via initial_eval."""
    return init(state['x'],
                state['sk'].shape[0] if n_corr is None else n_corr,
                history_dtype=state['sk'].dtype)


def resample(state, hw, new_x=None):
    """Warm-starts x at a new resolution and clears optimizer state
    (optimizers.py:110-119)."""
    if new_x is not None:
        x = jnp.asarray(new_x, jnp.float32)
    else:
        x = resize_nhwc(state['x'], tuple(hw), 'lanczos3')
    return init(x, state['sk'].shape[0], history_dtype=state['sk'].dtype)

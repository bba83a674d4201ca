"""Input-domain losses with analytic gradients, reference-exact.

tv_norm / p_norm replicate reference utils.py:285-304 (originally from
jcjohnson/cnn-vis), including the circular boundary handling (the reference's
roll_by_one wraps around) and the 1e-8 epsilon inside the TV integrand.
Gradients are the reference's analytic formulas, NOT autodiff — the caller
(engine/objective.py) applies them on x/255 without the 1/255 chain factor,
exactly as worker.py:283-297 does.

Layout here is NHWC: rolls act on axes 1 (height) and 2 (width), mirroring
the reference's NCHW axes 2 and 3.
"""

import jax.numpy as jnp


def tv_norm(x, beta=2.0):
    """Total variation norm (circular boundary) and its gradient.

    norm = sum((dx^2 + dy^2 + 1e-8)^(beta/2)) over all pixels/channels;
    the epsilon is inside the power even at beta=2 (reference utils.py:289).
    """
    beta = jnp.float32(beta)
    x_diff = x - jnp.roll(x, -1, axis=2)   # horizontal neighbor (width)
    y_diff = x - jnp.roll(x, -1, axis=1)   # vertical neighbor (height)
    grad_norm2 = x_diff ** 2 + y_diff ** 2 + jnp.float32(1e-8)
    norm = jnp.sum(grad_norm2 ** (beta / 2))
    dgrad_norm = (beta / 2) * grad_norm2 ** (beta / 2 - 1)
    dx_diff = 2 * x_diff * dgrad_norm
    dy_diff = 2 * y_diff * dgrad_norm
    grad = dx_diff + dy_diff
    grad = grad - jnp.roll(dx_diff, 1, axis=2)
    grad = grad - jnp.roll(dy_diff, 1, axis=1)
    return norm, grad


def p_norm(x, p=2.0):
    """1/p of the p-norm to the p-th power, and its gradient
    (reference utils.py:300-304)."""
    p = jnp.float32(p)
    norm = jnp.sum(jnp.abs(x) ** p) / p
    grad = jnp.sign(x) * jnp.abs(x) ** (p - 1)
    return norm, grad


def tv_norm_s2d(y, channels, beta=2.0):
    """tv_norm of a full-resolution image, computed directly on its
    space-to-depth form (models/vgg19._space_to_depth layout: channel
    (p*2 + q)*c + k for row/col offsets p, q) without leaving the s2d
    domain. Returns (norm, grad) with the gradient in the SAME s2d layout
    — bit-identical to s2d(tv_norm(d2s(y))[1]) (verified in test_ops).

    The building block for keeping the optimization iterate s2d-resident
    across a fused scan: the round-3 2048px traces price the per-step
    shuffle (forward + backward reshapes and their layout copies) at
    ~13 ms/step in 'transpose' form, ~6 ms in 'slice' form — an
    s2d-resident iterate pays it once per chunk instead of once per step.

    A full-res neighbor difference maps to block algebra: the horizontal
    neighbor of a q=0 pixel is q=1 of the same block; of a q=1 pixel, q=0
    of block j+1 (circularly) — and the same for p/vertical.
    """
    beta = jnp.float32(beta)
    n, h2, w2, c4 = y.shape
    c = channels
    v = y.reshape(n, h2, w2, 2, 2, c)                        # [..., p, q, k]
    xd0 = v[..., 0, :] - v[..., 1, :]
    xd1 = v[..., 1, :] - jnp.roll(v, -1, axis=2)[..., 0, :]
    x_diff = jnp.stack([xd0, xd1], axis=4)
    yd0 = v[..., 0, :, :] - v[..., 1, :, :]
    yd1 = v[..., 1, :, :] - jnp.roll(v, -1, axis=1)[..., 0, :, :]
    y_diff = jnp.stack([yd0, yd1], axis=3)
    grad_norm2 = x_diff ** 2 + y_diff ** 2 + jnp.float32(1e-8)
    norm = jnp.sum(grad_norm2 ** (beta / 2))
    dgrad_norm = (beta / 2) * grad_norm2 ** (beta / 2 - 1)
    dx_diff = 2 * x_diff * dgrad_norm
    dy_diff = 2 * y_diff * dgrad_norm
    grad = dx_diff + dy_diff
    # Subtract the left/upper neighbor's diff terms (the reference's
    # roll(+1) lines), translated to block algebra.
    grad = grad - jnp.stack(
        [jnp.roll(dx_diff, 1, axis=2)[..., 1, :], dx_diff[..., 0, :]],
        axis=4)
    grad = grad - jnp.stack(
        [jnp.roll(dy_diff, 1, axis=1)[..., 1, :, :], dy_diff[..., 0, :, :]],
        axis=3)
    return norm, grad.reshape(n, h2, w2, c4)

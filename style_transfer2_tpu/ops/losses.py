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

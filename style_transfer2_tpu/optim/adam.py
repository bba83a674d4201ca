"""The reference's Adam variant (optimizers.py:7-47) as a pure pytree.

Differences from textbook Adam, preserved exactly:
  * first and second moments are DecayingMean instances with initialization
    bias correction driven by separate item counters — and
    ``objective_changed`` resets the step count and the FIRST moment only,
    keeping the second moment and its counter (optimizers.py:42-47);
  * on resolution change the first moment is Lanczos-resampled and the
    second moment bilinear-resampled then clamped >= 0 (optimizers.py:29-40),
    so optimization warm-starts across the coarse-to-fine ladder;
  * the update is x -= step_size * m_hat / (sqrt(v_hat) + 1e-8) with the
    step size acting as a maximum per-parameter change.

State is a dict pytree; ``step`` is pure and designed to be closed over by
the fused jitted step in engine/steps.py.
"""

import jax.numpy as jnp
import numpy as np

from ..ops.resample import resize_nhwc

B1_DEFAULT = 0.9
B2_DEFAULT = 0.999


def init(x):
    """Fresh Adam state around the iterate x (any float32 array)."""
    x = jnp.asarray(x, jnp.float32)
    return {
        'x': x,
        'g1_mean': jnp.zeros_like(x),
        'g1_items': jnp.int32(0),
        'g2_mean': jnp.zeros_like(x),
        'g2_items': jnp.int32(0),
        't': jnp.int32(0),
    }


def step(state, opfunc, step_size, b1=B1_DEFAULT, b2=B2_DEFAULT):
    """One Adam step. opfunc(x) -> (loss, grad, aux). Returns (state', loss,
    aux). Matches AdamOptimizer.step (optimizers.py:20-27)."""
    x = state['x']
    loss, grad, aux = opfunc(x)

    g1_mean = b1 * state['g1_mean'] + (1 - b1) * grad
    g1_items = state['g1_items'] + 1
    g2_mean = b2 * state['g2_mean'] + (1 - b2) * jnp.square(grad)
    g2_items = state['g2_items'] + 1

    g1 = g1_mean / (1 - jnp.power(jnp.float32(b1), g1_items))
    g2 = g2_mean / (1 - jnp.power(jnp.float32(b2), g2_items))

    x_new = x - step_size * g1 / (jnp.sqrt(g2) + jnp.float32(1e-8))

    state_new = {
        'x': x_new,
        'g1_mean': g1_mean,
        'g1_items': g1_items,
        'g2_mean': g2_mean,
        'g2_items': g2_items,
        't': state['t'] + 1,
    }
    return state_new, loss, aux


def objective_changed(state):
    """Resets the step count and the first moment; keeps the second moment
    AND its bias-correction counter (optimizers.py:42-47)."""
    return {
        'x': state['x'],
        'g1_mean': jnp.zeros_like(state['g1_mean']),
        'g1_items': jnp.int32(0),
        'g2_mean': state['g2_mean'],
        'g2_items': state['g2_items'],
        't': jnp.int32(0),
    }


def resample(state, hw, new_x=None):
    """Warm-starts the state at a new resolution (optimizers.py:29-40):
    Lanczos for x and the first moment, bilinear + clamp >= 0 for the second
    moment."""
    if new_x is not None:
        x = jnp.asarray(new_x, jnp.float32)
        hw = x.shape[1:3]
    else:
        x = resize_nhwc(state['x'], tuple(hw), 'lanczos3')
    g1_mean = resize_nhwc(state['g1_mean'], tuple(hw), 'lanczos3')
    g2_mean = jnp.maximum(0.0, resize_nhwc(state['g2_mean'], tuple(hw), 'bilinear'))
    return {
        'x': x,
        'g1_mean': g1_mean,
        'g1_items': state['g1_items'],
        'g2_mean': g2_mean,
        'g2_items': state['g2_items'],
        't': state['t'],
    }

"""On-device image resampling.

The reference resamples on the host with PIL across a thread pool
(utils.py:130-160) — warm-starting the iterate and the Adam moments at
resolution changes (optimizers.py:29-40). Here resampling is a jitted XLA op
so warm starts never leave HBM. Methods: 'lanczos3' (the PIL LANCZOS analog)
and 'bilinear' (used for the Adam second-moment, which is then clamped >= 0
by the optimizer). Antialiasing is enabled, matching PIL's behavior when
downscaling.
"""

import functools

import jax
import jax.numpy as jnp

_METHODS = {'lanczos': 'lanczos3', 'lanczos3': 'lanczos3', 'bilinear': 'bilinear'}


@functools.partial(jax.jit, static_argnames=('hw', 'method'))
def resize_nhwc(x, hw, method='lanczos3'):
    """Resizes a (n, h, w, c) float array to (n, *hw, c) on device."""
    method = _METHODS[method]
    n, _, _, c = x.shape
    out_shape = (n, int(hw[0]), int(hw[1]), c)
    return jax.image.resize(x.astype(jnp.float32), out_shape, method=method,
                            antialias=True)

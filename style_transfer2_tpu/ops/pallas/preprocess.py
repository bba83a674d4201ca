"""Pallas preprocessing kernel: mean-subtract + deprocess round-trip.

The reference preprocesses on the host (worker.py:63-71: float32 cast, mean
subtract, layout shuffle). On TPU this is a bandwidth-bound elementwise op
that XLA fuses well already; the kernel exists to complete the BASELINE
north star's kernel list and to fold the uint8->float32 cast, the mean
subtraction, and (optionally) the clip-for-display into single VMEM passes.
Used via ops.pallas.preprocess_pallas / deprocess_pallas; the jnp paths in
models/vgg19.py remain the default.

Layout: (H, W, 3) with the trailing channel dim padded to the 128-lane tile
by the wrapper (Pallas pads the block; the pad lanes are sliced off).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .style_kernel import _use_interpret


def _mean_rgb():
    # Lazy: models.vgg19 imports ops.pallas.conv, so a module-level import
    # here would be circular.
    from ...models.vgg19 import MEAN_RGB
    return MEAN_RGB

TILE_H = 256


def _preprocess_kernel(x_ref, mean_ref, out_ref):
    # Input arrives as float32: Mosaic does not lower uint8 casts in-kernel,
    # so the wrapper casts before the call (XLA folds it into the HBM copy).
    out_ref[:] = x_ref[:] - mean_ref[:]


def _deprocess_kernel(x_ref, mean_ref, out_ref):
    out_ref[:] = x_ref[:] + mean_ref[:]


def _elementwise_call(kernel, x, mean_row, out_dtype):
    h, w3 = x.shape
    h_pad = -(-h // TILE_H) * TILE_H
    if h_pad != h:
        x = jnp.pad(x, ((0, h_pad - h), (0, 0)))
    grid = (h_pad // TILE_H,)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_H, w3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w3), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_H, w3), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h_pad, w3), out_dtype),
        interpret=_use_interpret(),
    )(x, mean_row)
    return out[:h]


@functools.partial(jax.jit, static_argnames=())
def preprocess_pallas(image):
    """(H, W, 3) RGB (uint8 or float) -> (1, H, W, 3) float32 mean-subtracted
    — the kernel version of models.vgg19.preprocess."""
    image = jnp.asarray(image, jnp.float32)
    if image.ndim == 4:
        image = image[0]
    h, w, c = image.shape
    flat = image.reshape(h, w * c)
    mean_row = jnp.tile(jnp.asarray(_mean_rgb(), jnp.float32), w)[None, :]
    out = _elementwise_call(_preprocess_kernel, flat, mean_row, jnp.float32)
    return out.reshape(1, h, w, c)


@functools.partial(jax.jit, static_argnames=())
def deprocess_pallas(x):
    """(1, H, W, 3) float32 -> (H, W, 3) float32 RGB — the kernel version of
    models.vgg19.deprocess."""
    x = jnp.asarray(x, jnp.float32)
    if x.ndim == 4:
        x = x[0]
    h, w, c = x.shape
    flat = x.reshape(h, w * c)
    mean_row = jnp.tile(jnp.asarray(_mean_rgb(), jnp.float32), w)[None, :]
    out = _elementwise_call(_deprocess_kernel, flat, mean_row, jnp.float32)
    return out.reshape(h, w, c)

"""Gram matrices of feature maps.

Matches reference worker.py:109-114: for a (1, c, h, w) feature map x
reshaped to (c, h*w), G = x @ x.T / x.size with x.size = c*h*w. Our feature
maps are NHWC, so the contraction is (h*w, c)^T @ (h*w, c) — a single big
MXU matmul with the channel dim on the lanes.
"""

import jax
import jax.numpy as jnp


def gram_matrix(feat, precision=jax.lax.Precision.HIGHEST, channels=None):
    """(1, h, w, c) or (h, w, c) feature map -> (c, c) Gram matrix, divided
    by the total element count c*h*w (reference worker.py:114).

    ``channels`` is the TRUE channel count when the feature map is stored in
    an internal layout whose last dim differs (the block-1 space-to-depth
    taps, models/vgg19.py BLOCK1_S2D): the Gram sums an outer product over
    pixels, so any pixel permutation of the rows gives the same matrix."""
    if feat.ndim == 4:
        if feat.shape[0] != 1:
            raise ValueError('gram_matrix expects batch size 1; use vmap for batches')
        feat = feat[0]
    c = feat.shape[-1] if channels is None else channels
    flat = feat.reshape(-1, c)
    g = jnp.dot(flat.T, flat, precision=precision,
                preferred_element_type=jnp.float32)
    return g / jnp.float32(flat.size)

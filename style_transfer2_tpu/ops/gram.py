"""Gram matrices of feature maps.

Matches reference worker.py:109-114: for a (1, c, h, w) feature map x
reshaped to (c, h*w), G = x @ x.T / x.size with x.size = c*h*w. Our feature
maps are NHWC, so the contraction is (h*w, c)^T @ (h*w, c) — a single big
MXU matmul with the channel dim on the lanes.
"""

import jax
import jax.numpy as jnp


def gram_matrix(feat, precision=jax.lax.Precision.HIGHEST):
    """(1, h, w, c) or (h, w, c) feature map -> (c, c) Gram matrix, divided
    by the total element count c*h*w (reference worker.py:114)."""
    if feat.ndim == 4:
        if feat.shape[0] != 1:
            raise ValueError('gram_matrix expects batch size 1; use vmap for batches')
        feat = feat[0]
    h, w, c = feat.shape
    flat = feat.reshape(h * w, c)
    g = jnp.dot(flat.T, flat, precision=precision,
                preferred_element_type=jnp.float32)
    return g / jnp.float32(flat.size)

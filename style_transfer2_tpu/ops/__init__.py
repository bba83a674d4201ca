"""Numeric ops: Gram matrices, style-transfer losses, on-device resampling."""

from .gram import gram_matrix
from .losses import p_norm, tv_norm
from .resample import resize_nhwc

__all__ = ['gram_matrix', 'p_norm', 'tv_norm', 'resize_nhwc']

"""Pallas TPU kernels for the hot non-conv ops.

The convs live in XLA's sweet spot; these kernels cover the rest of the
per-iteration work the BASELINE north star names: the Gram-matrix
contraction and the style gradient, fused into a single two-phase kernel
(one HBM round less than the unfused jnp path — the C x C Gram never
leaves VMEM between its accumulation and its use in the gradient matmul).
"""

from .preprocess import deprocess_pallas, preprocess_pallas
from .style_kernel import fused_style_branch, gram_pallas

__all__ = ['deprocess_pallas', 'fused_style_branch', 'gram_pallas',
           'preprocess_pallas']

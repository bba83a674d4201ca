"""The fused jitted optimization engine and the StyleTransfer state machine."""

from .objective import ObjectiveSpec, make_objective
from .transfer import StyleTransfer

__all__ = ['ObjectiveSpec', 'make_objective', 'StyleTransfer']

"""Shared utilities: config, logging, tracing, image helpers."""

from .config import parse_args, read_config
from .logging import (enable_compile_cache, setup_exceptions,
                      setup_logging, setup_signals)
from .meanvar import DecayingMean
from .profiling import device_trace, line_profile, profile
from .tracing import Trace
from .images import (
    as_pil,
    fit_into_square,
    resample_hwc,
    resample_nchw,
    resize_to_fit,
    scales,
)

__all__ = [
    'parse_args', 'read_config',
    'enable_compile_cache', 'setup_exceptions', 'setup_logging',
    'setup_signals',
    'DecayingMean', 'Trace', 'device_trace', 'line_profile', 'profile',
    'as_pil', 'fit_into_square', 'resample_hwc', 'resample_nchw',
    'resize_to_fit', 'scales',
]

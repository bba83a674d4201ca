"""Profiling context managers (reference utils.py:72-107, plus the TPU-side
jax.profiler analog)."""

import cProfile
from contextlib import contextmanager
import inspect
import sys


@contextmanager
def profile():
    """Prints a cProfile report for the enclosed host-side code."""
    prof = cProfile.Profile()
    prof.enable()
    yield
    prof.disable()
    prof.print_stats(1)
    prof.clear()


@contextmanager
def line_profile(*items):
    """Prints a line-by-line profile for the given functions/modules/module
    names while execution is in context (requires line_profiler)."""
    from line_profiler import LineProfiler
    prof = LineProfiler()
    for item in items:
        if inspect.isfunction(item):
            prof.add_function(item)
        elif inspect.ismodule(item):
            prof.add_module(item)
        elif isinstance(item, str):
            prof.add_module(sys.modules[item])
        else:
            raise TypeError('Inputs must be functions, modules, or module names')
    prof.enable()
    yield
    prof.disable()
    prof.print_stats()


@contextmanager
def device_trace(log_dir):
    """Captures a jax.profiler device trace (XLA ops, fusions, HBM traffic)
    for the enclosed code; view with TensorBoard or xprof."""
    import jax
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()

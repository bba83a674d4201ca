"""Ordered trace recording of internal scalar values (reference utils.py:257-282).

The jitted step returns a flat dict of device scalars; Trace is the host-side
accumulator that orders them, dedups repeated names by appending underscores,
and converts NumPy/JAX scalars to plain Python floats/ints so traces stay
JSON/pickle friendly all the way to the browser.
"""

from collections import OrderedDict
import math

import numpy as np


class Trace:
    """A convenience class for recording snapshots of internal values."""

    def __init__(self, data=None):
        self.data = OrderedDict()
        if data:
            for name, expr in data.items():
                self(name, expr)

    def __call__(self, name, expr):
        while name in self.data:
            name += '_'
        self.data[name] = _to_python_scalar(expr)
        return expr

    def __str__(self):
        return ', '.join('%s: %g' % item for item in self.data.items())

    def rms(self, name, expr):
        """Records the RMS of expr under the given name and returns expr."""
        self(name, np.sqrt(np.mean(np.asarray(expr, dtype=np.float64) ** 2)))
        return expr


def _to_python_scalar(expr):
    if isinstance(expr, (int, float)):
        return expr
    if isinstance(expr, np.floating):
        return float(expr)
    if isinstance(expr, np.integer):
        return int(expr)
    # JAX scalars / 0-d arrays
    try:
        if hasattr(expr, 'shape') and getattr(expr, 'shape') == ():
            val = expr.item() if hasattr(expr, 'item') else float(expr)
            return val
    except Exception:
        pass
    return expr


def device_trace_to_host(trace):
    """Converts a dict of device scalars into an ordered dict of Python
    scalars in one host sync, preserving insertion order."""
    out = OrderedDict()
    for name, value in trace.items():
        out[name] = _to_python_scalar(np.asarray(value)[()] if hasattr(value, 'shape') else value)
    return out


def is_finite_trace(trace):
    """True if every numeric value in the trace is finite."""
    for value in trace.values():
        if isinstance(value, float) and not math.isfinite(value):
            return False
    return True

"""ctypes bindings for the native resampler (native/resample.cpp).

Replaces the reference's PIL-across-a-thread-pool resampling
(utils.py:130-160) with a C++ separable Lanczos3/bilinear kernel
multithreaded across planes. utils/images.py falls back to PIL when the
library hasn't been built (make -C native).
"""

import ctypes
from pathlib import Path

import numpy as np

_LIB_PATH = Path(__file__).parent / 'libst2resample.so'

_METHODS = {'lanczos': 0, 'lanczos3': 0, 'bilinear': 1}

_lib = None
if _LIB_PATH.exists():
    _lib = ctypes.CDLL(str(_LIB_PATH))
    _lib.st2_resample_planes_f32.restype = ctypes.c_int
    _lib.st2_resample_planes_f32.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]


def available():
    return _lib is not None


def resample_planes(planes, hw, method='lanczos'):
    """Resamples a (n, h, w) float32 stack of planes to (n, *hw)."""
    if _lib is None:
        raise RuntimeError('native resample library not built')
    planes = np.ascontiguousarray(planes, np.float32)
    if planes.ndim != 3:
        raise ValueError('expected (n, h, w) planes')
    n, sh, sw = planes.shape
    dh, dw = int(hw[0]), int(hw[1])
    out = np.empty((n, dh, dw), np.float32)
    rc = _lib.st2_resample_planes_f32(
        planes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, sh, sw,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), dh, dw,
        _METHODS[method], 0)
    if rc != 0:
        raise RuntimeError('native resample failed with code %d' % rc)
    return out


def resample_hwc(a, hw, method='lanczos'):
    """Resamples an (h, w, c) float image to (*hw, c)."""
    a = np.ascontiguousarray(np.transpose(np.float32(a), (2, 0, 1)))
    out = resample_planes(a, hw, method)
    return np.ascontiguousarray(np.transpose(out, (1, 2, 0)))

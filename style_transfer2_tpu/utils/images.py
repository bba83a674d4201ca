"""Host-side image helpers (reference utils.py:130-160,193-254,307-309).

These run on the host only at the serving boundary (browser codec I/O and
thumbnailing). All per-iteration resampling happens on-device via
ops/resample.py; the PIL path here exists for host code and as the numeric
contract for warm-start resampling. A native C++ Lanczos resampler
(native/resample.cpp) replaces the PIL per-channel-thread hot path when built.
"""

import math

import numpy as np
from PIL import Image

try:
    from ..native import resample as _native_resample
    if not _native_resample.available():
        _native_resample = None
except Exception:  # pragma: no cover - native library not built
    _native_resample = None


def scales(size, min_size=1, factor=math.sqrt(2)):
    """Returns a list of (h, w) sizes increasing from min_size to size by the
    given factor — the coarse-to-fine resolution ladder (reference
    utils.py:193-207)."""
    size = np.float64(size)
    min_size = int(min_size)
    assert min_size >= 1

    sizes = [tuple(int(round(x)) for x in size)]
    while True:
        size = size / factor
        size_int = tuple(int(round(x)) for x in size)
        if max(size_int) < min_size or min(size_int) < 1:
            break
        sizes.append(size_int)
    sizes.reverse()
    return sizes


def fit_into_square(current_size, size, scale_up=False):
    """Determines the aspect-preserving (w, h) that fits into a size-by-size
    square (reference utils.py:210-223)."""
    size = int(round(size))
    w, h = current_size
    if not scale_up and max(w, h) <= size:
        return current_size
    if w > h:
        new_w = size
        new_h = int(round(size * h / w))
    else:
        new_h = size
        new_w = int(round(size * w / h))
    return (new_w, new_h)


def resize_to_fit(image, size, scale_up=True):
    """Resizes a PIL image to fit into a size-by-size square."""
    new_size = fit_into_square(image.size, size, scale_up)
    return image.resize(new_size, Image.LANCZOS)


def _pil_method(method):
    if method in ('lanczos', Image.LANCZOS):
        return Image.LANCZOS
    if method in ('bilinear', Image.BILINEAR):
        return Image.BILINEAR
    raise ValueError('Unsupported resampling method: %r' % (method,))


def resample_hwc(a, hw, method='lanczos'):
    """Resamples an HxWxC float image array to a new (h, w). Float32 result."""
    a = np.float32(a)
    if _native_resample is not None:
        try:
            return _native_resample.resample_hwc(a, hw, method)
        except Exception:
            pass
    pil_method = _pil_method(method)
    ch = a.shape[-1]
    b = np.zeros((hw[0], hw[1], ch), np.float32)
    for i in range(ch):
        b[:, :, i] = Image.fromarray(a[:, :, i]).resize((hw[1], hw[0]), pil_method)
    return b


def resample_nchw(a, hw, method='lanczos'):
    """Resamples an NxCxHxW float array to a new (h, w). Float32 result."""
    a = np.float32(a)
    n, ch = a.shape[:2]
    if _native_resample is not None:
        try:
            flat = a.reshape((n * ch,) + a.shape[2:])
            out = _native_resample.resample_planes(flat, hw, method)
            return out.reshape((n, ch) + tuple(hw))
        except Exception:
            pass
    pil_method = _pil_method(method)
    b = np.zeros((n, ch, hw[0], hw[1]), np.float32)
    for i in range(n):
        for j in range(ch):
            b[i, j] = Image.fromarray(a[i, j]).resize((hw[1], hw[0]), pil_method)
    return b


def as_pil(arr):
    """Converts a NumPy HxWxC float array to a PIL image, clipping to [0, 255]."""
    return Image.fromarray(np.uint8(np.clip(arr, 0, 255)))

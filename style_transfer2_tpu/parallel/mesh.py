"""Device mesh construction.

Axis convention: ('data', 'space') — batch lanes ride 'data' (one user job
per lane), the image height axis shards over 'space' for high-resolution
jobs. A 1-D mesh uses whichever axis the caller needs; collectives ride ICI
within a slice (DCN never carries per-iteration traffic).
"""

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(spec='auto', axis_names=('data', 'space'), devices=None,
              backend=None):
    """Builds a Mesh from a config-style spec.

    spec: 'auto' (all devices on the first axis), an int N (first N devices,
    1-D), or 'AxB' (2-D, A*B devices over (data, space)).
    """
    if devices is None:
        devices = jax.devices(backend) if backend else jax.devices()
    if spec in ('auto', '', None):
        shape = (len(devices),)
    elif isinstance(spec, int) or (isinstance(spec, str) and spec.isdigit()):
        shape = (int(spec),)
    elif isinstance(spec, (tuple, list)):
        shape = tuple(int(s) for s in spec)
    else:
        shape = tuple(int(s) for s in str(spec).lower().split('x'))
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError('Mesh %r needs %d devices, have %d'
                         % (spec, n, len(devices)))
    arr = np.array(devices[:n]).reshape(shape)
    return Mesh(arr, axis_names[:len(shape)])

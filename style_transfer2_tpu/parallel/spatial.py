"""Spatial sharding for high-resolution outputs (SURVEY.md §5 long-context).

The reference's resolution scaling is host-paced coarse-to-fine with a
max_size cap; memory on one device is the binding constraint
(worker.py:84). Here a 4K+ job shards the image HEIGHT axis across the
mesh's 'space' axis and runs the SAME fused step:

  * 3x3 convs -> XLA's SPMD partitioner inserts 1-pixel halo exchanges
    automatically (no hand-written ppermute);
  * Gram matrices -> the (h*w, c)^T @ (h*w, c) contraction over the sharded
    axis becomes a local matmul + psum (C x C is resolution-independent —
    cheap to reduce);
  * the TV loss's circular rolls -> collective permutes at the shard
    boundary;
  * scalar losses/trace values -> psum.

This is the idiomatic-GSPMD formulation: annotate the inputs, jit the same
program, let the compiler place the collectives. The engine applies a
placement via StyleTransfer(placement=SpatialPlacement(mesh)).
"""

import jax
from jax.sharding import NamedSharding, PartitionSpec as P


class SpatialPlacement:
    """Places engine arrays so the image H axis shards over a mesh axis.

    Array-rank conventions in the engine:
      4-D (1, H, W, C)          — iterate / content / feature maps / moments
      5-D (n_corr, 1, H, W, C)  — L-BFGS history buffers
      2-D (C, C)                — Gram matrices (replicated)
      scalars                   — replicated
    """

    def __init__(self, mesh, axis='space'):
        if axis not in mesh.axis_names:
            # Fall back to the first axis of a 1-D mesh.
            axis = mesh.axis_names[0]
        self.mesh = mesh
        self.axis = axis

    def _sharding(self, shape):
        """H-axis sharding for image-like ranks; arrays whose H is not
        divisible by the axis size (deep pools at small resolutions)
        replicate — at high resolution (the regime this placement exists
        for) every conv feature shards."""
        ndim = len(shape)
        n_shards = self.mesh.shape[self.axis]
        if ndim == 4 and shape[1] % n_shards == 0:
            spec = P(None, self.axis, None, None)
        elif ndim == 5 and shape[2] % n_shards == 0:
            spec = P(None, None, self.axis, None, None)
        else:
            spec = P()
        return NamedSharding(self.mesh, spec)

    def image(self, x):
        """Places a (1, H, W, C) array sharded on H."""
        return jax.device_put(x, self._sharding(x.shape))

    def replicated(self, x):
        sharding = NamedSharding(self.mesh, P())
        return jax.tree_util.tree_map(
            lambda leaf: jax.device_put(leaf, sharding), x)

    def state(self, pytree):
        """Places an optimizer-state / feature pytree by leaf shape."""
        return jax.tree_util.tree_map(
            lambda leaf: jax.device_put(
                leaf, self._sharding(getattr(leaf, 'shape', ()))),
            pytree)

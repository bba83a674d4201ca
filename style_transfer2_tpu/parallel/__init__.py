"""Multi-chip parallelism: device meshes, spatial sharding, batched serving.

The reference's only parallelism is whole-process granularity (router × N
app+worker pairs, router.py:73-83) plus host threads for resampling. The
TPU-native analogs (SURVEY.md §2):

  * batch.py — concurrent user jobs become batch lanes vmapped over the
    'data' mesh axis (instance parallelism -> data parallelism);
  * spatial.py — high-resolution outputs shard the image H axis over the
    'space' mesh axis; XLA's SPMD partitioner inserts the halo exchanges
    for the 3x3 convs and the collectives for Gram/psum reductions
    (the image-domain analog of sequence/context parallelism).
"""

from .mesh import make_mesh
from .spatial import SpatialPlacement
from .batch import (
    DataPlacement,
    build_batched_step_fns,
    stack_lanes,
    unstack_lane,
)

__all__ = ['make_mesh', 'SpatialPlacement', 'DataPlacement',
           'build_batched_step_fns', 'stack_lanes', 'unstack_lane']

"""style_transfer2_tpu — a TPU-native neural style transfer framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
crowsonkb/style_transfer2 (reference layout: app.py / worker.py / router.py /
optimizers.py / utils.py / messages.py). The reference delegates compute to
Caffe (C++/CUDA) behind a 3-process ZeroMQ topology; here the entire
optimization step — VGG-19 feature extraction, Gram/content/TV/p-norm losses,
analytic gradients, and the optimizer update — fuses into a single jitted XLA
program that runs on TPU with zero host round-trips per iteration.

Subpackages:
  models    — truncated VGG-19 feature extractor + weight converters
  ops       — losses, Gram matrices, on-device resampling, Pallas kernels
  optim     — reference-semantics Adam variant and fixed-step L-BFGS as pytrees
  engine    — the fused jitted step, objective state, StyleTransfer state machine
  parallel  — device meshes, spatial (high-res) sharding, batched serving
  serve     — aiohttp web tier, in-process TPU driver, router/load balancer
  utils     — config, logging, tracing, image helpers
"""

__version__ = '0.1.0'

"""Test configuration: run everything on CPU with 8 virtual devices so
sharding/collective tests need no real TPU slice (SURVEY.md §4.4)."""

import os

# Must be set before jax initializes the CPU backend.
os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

# The axon sitecustomize force-sets jax_platforms="axon,cpu"; tests must run
# on the virtual CPU mesh regardless, so override it back.
jax.config.update('jax_platforms', 'cpu')

# Persistent compilation cache: the fused steps are expensive to compile on
# CPU; cache them across test runs.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), '..', '.jax_cache')
jax.config.update('jax_compilation_cache_dir', os.path.abspath(_CACHE_DIR))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)

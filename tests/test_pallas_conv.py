"""Fused Pallas conv3x3+bias+ReLU (ops/pallas/conv.py): parity with XLA's
lowering in both directions, the gating predicate, and the batched-tier
vmap path. Interpret mode on the CPU mesh makes these exact."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from style_transfer2_tpu.ops.pallas.conv import (
    MIN_CIN, conv3x3_bias_relu, supported)


def _ref(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=x.dtype)
    return jnp.maximum(y + b, 0.0)


def _case(seed, shape, cout, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(*shape), dtype)
    w = jnp.asarray(rng.randn(3, 3, shape[-1], cout) * 0.1, dtype)
    b = jnp.asarray(rng.randn(cout) * 0.1, dtype)
    return x, w, b


@pytest.mark.parametrize('shape,cout', [
    ((1, 16, 32, 64), 128),      # tile boundary (th=16, one tile)
    ((1, 24, 16, 128), 128),     # multi-tile H (th=8, 3 tiles)
    ((2, 8, 16, 64), 256),       # batch > 1 via the grid
])
def test_fwd_bwd_parity(shape, cout):
    x, w, b = _case(0, shape, cout)
    assert supported(x.shape, w.shape)
    np.testing.assert_allclose(conv3x3_bias_relu(x, w, b), _ref(x, w, b),
                               atol=1e-4, rtol=1e-5)

    g = jnp.asarray(np.random.RandomState(1).randn(
        *shape[:3], cout), jnp.float32)
    dx_pal = jax.grad(lambda x_: jnp.vdot(conv3x3_bias_relu(x_, w, b), g))(x)
    dx_ref = jax.grad(lambda x_: jnp.vdot(_ref(x_, w, b), g))(x)
    np.testing.assert_allclose(dx_pal, dx_ref, atol=1e-4, rtol=1e-5)


def test_bf16_parity():
    """bf16 in/out with f32 accumulation: agree with XLA's bf16 conv to
    bf16 resolution."""
    x, w, b = _case(2, (1, 16, 16, 128), 128, jnp.bfloat16)
    y_pal = np.float32(conv3x3_bias_relu(x, w, b))
    y_ref = np.float32(_ref(x, w, b))
    scale = max(1.0, float(np.abs(y_ref).max()))
    assert np.abs(y_pal - y_ref).max() / scale < 0.03


def test_relu_mask_routing():
    """The backward masks the cotangent by (y > 0): gradients vanish
    exactly where the forward output was clamped."""
    x, w, b = _case(3, (1, 8, 8, 64), 128)
    y = conv3x3_bias_relu(x, w, b)
    g = jnp.ones_like(y)
    dx = jax.grad(lambda x_: jnp.vdot(conv3x3_bias_relu(x_, w, b), g))(x)
    # An all-negative-bias conv clamps everywhere -> zero input grad.
    b_neg = b - 1e3
    dx0 = jax.grad(
        lambda x_: jnp.vdot(conv3x3_bias_relu(x_, w, b_neg), g))(x)
    assert float(jnp.abs(dx0).max()) == 0.0
    assert float(jnp.abs(dx).max()) > 0.0


def test_supported_gating():
    assert not supported((1, 16, 16, 3), (3, 3, 3, 64))        # thin C_in
    assert not supported((1, 16, 16, MIN_CIN), (3, 3, MIN_CIN, 65))  # lanes
    assert not supported((1, 16, 4, 64), (3, 3, 64, 128))      # W below 8
    assert not supported((1, 1024, 1024, 64), (3, 3, 64, 128))  # >MAX_PIXELS
    assert not supported((1, 16, 16, 64), (5, 5, 64, 128))     # not 3x3
    # W must be sublane-aligned: Mosaic rejects the kernel's
    # (rows, W, C) -> (rows*W, C) shape cast at W=181 (the 362px ladder
    # rung's s2d grid) — seen as a device compile failure in bench's
    # north-star phase, round 5.
    assert not supported((1, 181, 181, 64), (3, 3, 64, 128))
    assert not supported((1, 136, 181, 256), (3, 3, 256, 256))
    assert not supported((1, 272, 362, 128), (3, 3, 128, 128))
    assert supported((1, 512, 512, 64), (3, 3, 64, 128))


def test_vmap_batching():
    """The pooled tier vmaps the step over lanes; the kernel must batch."""
    x, w, b = _case(4, (3, 8, 8, 64), 128)
    one = jax.vmap(lambda xi: conv3x3_bias_relu(xi[None], w, b)[0])(x)
    np.testing.assert_allclose(one, _ref(x, w, b), atol=1e-4, rtol=1e-5)


def test_model_wiring_parity():
    """vgg19.PALLAS_CONV swaps the supported layers onto the fused kernel:
    features and the image gradient must match the XLA path to bf16
    resolution (covers both the s2d block-1 conv and the trunk convs)."""
    from style_transfer2_tpu.models import random_params, vgg19

    params = random_params(seed=0)
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.rand(1, 32, 32, 3) * 255.0 - 128.0, jnp.float32)
    layers = ('conv1_2', 'conv2_2', 'conv3_3')

    def run():
        feats = vgg19.extract_features(
            params, x, layers, compute_dtype=jnp.bfloat16)
        grad = jax.grad(lambda x_: sum(
            jnp.sum(jnp.square(f)) for f in vgg19.extract_features(
                params, x_, layers, compute_dtype=jnp.bfloat16).values()))(x)
        return feats, grad

    try:
        vgg19.PALLAS_CONV = False
        feats0, grad0 = run()
        vgg19.PALLAS_CONV = True
        jax.clear_caches()  # flag is read at trace time, not in the jit key
        feats1, grad1 = run()
    finally:
        vgg19.PALLAS_CONV = False
        jax.clear_caches()

    for name in layers:
        a, b = np.float32(feats0[name]), np.float32(feats1[name])
        scale = max(1.0, float(np.abs(a).max()))
        assert np.abs(a - b).max() / scale < 0.03, name
    gscale = max(1.0, float(np.abs(np.float32(grad0)).max()))
    assert np.abs(np.float32(grad0 - grad1)).max() / gscale < 0.05

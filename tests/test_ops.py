"""Unit tests for ops: Gram matrix, TV norm (circular boundary), p-norm —
checked against the independent NumPy oracle (SURVEY.md §4.2)."""

import jax.numpy as jnp
import numpy as np

import oracle
from style_transfer2_tpu.ops import gram_matrix, p_norm, resize_nhwc, tv_norm


def _nchw(x_nhwc):
    return np.transpose(x_nhwc, (0, 3, 1, 2))


def test_gram_matrix_matches_reference_math(rng):
    feat_nhwc = rng.randn(1, 7, 5, 16).astype(np.float32)
    ours = np.asarray(gram_matrix(jnp.asarray(feat_nhwc)))
    ref = oracle.gram_matrix(_nchw(feat_nhwc))
    assert ours.shape == (16, 16)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-7)
    # symmetric
    np.testing.assert_allclose(ours, ours.T, rtol=1e-5)


def test_tv_norm_matches_reference_math(rng):
    x_nhwc = rng.randn(1, 6, 9, 3).astype(np.float32)
    for beta in (2.0, 1.5, 3.0):
        norm, grad = tv_norm(jnp.asarray(x_nhwc), beta)
        ref_norm, ref_grad = oracle.tv_norm(_nchw(x_nhwc), beta)
        np.testing.assert_allclose(float(norm), ref_norm, rtol=1e-5)
        np.testing.assert_allclose(_nchw(np.asarray(grad)), ref_grad,
                                   rtol=1e-4, atol=1e-6)


def test_tv_norm_circular_boundary():
    # A constant image has zero TV gradient only with circular boundaries
    # intact; the norm equals N * 1e-8 (epsilon inside the power).
    x = jnp.ones((1, 4, 4, 3), jnp.float32) * 7.0
    norm, grad = tv_norm(x, 2.0)
    np.testing.assert_allclose(float(norm), 48 * 1e-8, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(grad), 0.0, atol=1e-12)


def test_p_norm_matches_reference_math(rng):
    x_nhwc = rng.randn(1, 5, 5, 3).astype(np.float32)
    for p in (2.0, 6.0):
        norm, grad = p_norm(jnp.asarray(x_nhwc), p)
        ref_norm, ref_grad = oracle.p_norm(_nchw(x_nhwc), p)
        np.testing.assert_allclose(float(norm), ref_norm, rtol=1e-5)
        np.testing.assert_allclose(_nchw(np.asarray(grad)), ref_grad,
                                   rtol=1e-4, atol=1e-6)


def test_resize_shapes_and_dc_preservation(rng):
    x = jnp.ones((1, 16, 16, 3), jnp.float32) * 5.0
    up = resize_nhwc(x, (23, 31), 'lanczos3')
    assert up.shape == (1, 23, 31, 3)
    np.testing.assert_allclose(np.asarray(up), 5.0, rtol=1e-5)
    down = resize_nhwc(x, (7, 9), 'bilinear')
    assert down.shape == (1, 7, 9, 3)
    np.testing.assert_allclose(np.asarray(down), 5.0, rtol=1e-5)


def test_tv_norm_s2d_matches_full_res():
    """tv_norm_s2d on the s2d form equals tv_norm on the full-res image:
    the norm to float tolerance, the gradient bit-exactly (after mapping
    back with depth-to-space)."""
    import numpy as np
    import jax.numpy as jnp
    from style_transfer2_tpu.ops.losses import tv_norm, tv_norm_s2d
    from style_transfer2_tpu.models.vgg19 import (_space_to_depth,
                                                  _depth_to_space)

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.uniform(0, 1, (1, 8, 12, 3)).astype(np.float32))
    y = _space_to_depth(x)
    for beta in (2.0, 1.5, 6.0):
        n_ref, g_ref = tv_norm(x, beta)
        n_s2d, g_s2d = tv_norm_s2d(y, 3, beta)
        np.testing.assert_allclose(np.asarray(n_s2d), np.asarray(n_ref),
                                   rtol=1e-6)
        np.testing.assert_array_equal(
            np.asarray(_depth_to_space(g_s2d, 3)), np.asarray(g_ref))

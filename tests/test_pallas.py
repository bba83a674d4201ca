"""Pallas kernel tests (interpret mode on CPU): the fused style branch must
match the unfused jnp math exactly."""

import jax.numpy as jnp
import numpy as np

from style_transfer2_tpu.ops.gram import gram_matrix
from style_transfer2_tpu.ops.pallas import fused_style_branch, gram_pallas


def _reference_style_branch(feat, gram_style):
    _, h, w, c = feat.shape
    flat = feat.reshape(h * w, c)
    gd = gram_matrix(feat) - gram_style
    s_grad = jnp.dot(flat, gd, preferred_element_type=jnp.float32)
    s_grad = s_grad.reshape(1, h, w, c) * (2.0 / (c * c * h * w * c))
    return s_grad, gd


def test_fused_style_branch_matches_jnp(rng):
    for h, w, c in [(16, 16, 64), (24, 20, 128), (37, 31, 64)]:
        feat = jnp.asarray(rng.randn(1, h, w, c).astype(np.float32))
        gs = jnp.asarray(rng.randn(c, c).astype(np.float32))
        s_grad, gdiff = fused_style_branch(feat, gs)
        ref_grad, ref_gd = _reference_style_branch(feat, gs)
        np.testing.assert_allclose(np.asarray(gdiff), np.asarray(ref_gd),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(s_grad), np.asarray(ref_grad),
                                   rtol=1e-5, atol=1e-7)


def test_gram_pallas_matches_gram(rng):
    feat = jnp.asarray(rng.randn(1, 20, 28, 64).astype(np.float32))
    got = gram_pallas(feat)
    want = gram_matrix(feat)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_engine_with_pallas_matches_plain(rng):
    """A StyleTransfer with use_pallas=True must produce identical traces
    (interpret mode on CPU)."""
    from style_transfer2_tpu.engine import StyleTransfer
    from style_transfer2_tpu.models import random_params

    weights = {'content': {'conv2_2': 0.1},
               'style': {'conv1_1': 1.0, 'conv2_1': 1.0}, 'deepdream': {}}
    scalars = {'p': 50.0, 'p_power': 6.0, 'tv': 5.0, 'tv_power': 2.0}
    imgs = [rng.randint(0, 256, (24, 24, 3)).astype(np.uint8)
            for _ in range(3)]

    def make(use_pallas):
        st = StyleTransfer(random_params(3), use_pallas=use_pallas)
        st.set_weights(weights, scalars)
        st.set_optimizer('adam')
        st.set_step_size(10.0)
        st.set_content(imgs[0])
        st.set_style(imgs[1])
        st.set_input(imgs[2])
        assert st.start()
        return st

    a, b = make(False), make(True)
    for _ in range(2):
        _, ta = a.step()
        _, tb = b.step()
        for key in ta:
            if key == 'time':
                continue
            np.testing.assert_allclose(ta[key], tb[key], rtol=1e-5,
                                       err_msg=key)


def test_preprocess_kernel_matches_jnp(rng):
    from style_transfer2_tpu.models.vgg19 import deprocess, preprocess
    from style_transfer2_tpu.ops.pallas import (deprocess_pallas,
                                                preprocess_pallas)

    img = rng.randint(0, 256, (37, 41, 3)).astype(np.uint8)
    got = preprocess_pallas(img)
    want = preprocess(img)
    assert got.shape == want.shape == (1, 37, 41, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    back = deprocess_pallas(got)
    np.testing.assert_allclose(np.asarray(back), np.asarray(deprocess(want)),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(back), np.float32(img), atol=1e-3)

"""Model-core tests: VGG-19 structure, Caffe pooling parity, forward and
vjp parity against the independent torch oracle (SURVEY.md §4.1-4.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import oracle
from style_transfer2_tpu.models import (
    BLOB_NAMES,
    VGG19Features,
    deprocess,
    preprocess,
    random_params,
)
from style_transfer2_tpu.models.vgg19 import _max_pool_ceil


def _nchw(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


def _nhwc(x):
    return np.transpose(np.asarray(x), (0, 2, 3, 1))


def test_blob_names():
    assert BLOB_NAMES[0] == 'data'
    assert len(BLOB_NAMES) == 22
    assert BLOB_NAMES[1:4] == ('conv1_1', 'conv1_2', 'pool1')
    assert BLOB_NAMES[-1] == 'pool5'


def test_preprocess_roundtrip(rng):
    img = rng.randint(0, 256, (10, 12, 3)).astype(np.uint8)
    x = preprocess(img)
    assert x.shape == (1, 10, 12, 3)
    back = deprocess(x)
    np.testing.assert_allclose(np.asarray(back), np.float32(img),
                               rtol=1e-6, atol=1e-4)


def test_preprocess_no_channel_swap():
    # The reference's [::1] is a no-op: red stays in channel 0.
    img = np.zeros((2, 2, 3), np.float32)
    img[..., 0] = 200.0
    x = np.asarray(preprocess(img))
    np.testing.assert_allclose(x[0, :, :, 0], 200.0 - 123.68, rtol=1e-6)
    np.testing.assert_allclose(x[0, :, :, 2], -103.939, rtol=1e-5)


def test_max_pool_ceil_matches_caffe(rng):
    # Odd sizes exercise Caffe's ceil-mode output with a clipped last window.
    for h, w in [(5, 7), (4, 4), (9, 3)]:
        x = rng.randn(1, h, w, 2).astype(np.float32)
        ours = np.asarray(_max_pool_ceil(jnp.asarray(x)))
        ref = F.max_pool2d(torch.from_numpy(_nchw(x)), 2, 2,
                           ceil_mode=True).numpy()
        np.testing.assert_allclose(ours, _nhwc(ref), rtol=1e-6)


def test_forward_parity_with_oracle(rng):
    params = random_params(3)
    model = VGG19Features(params)
    ref = oracle.OracleVGG(params)

    img = rng.randint(0, 256, (33, 41, 3)).astype(np.uint8)  # odd sizes
    x = preprocess(img)
    x_ref = ref.preprocess(img)
    np.testing.assert_allclose(_nchw(x), x_ref, rtol=1e-5, atol=1e-4)

    layers = ('data', 'conv1_1', 'pool1', 'conv2_2', 'conv3_1', 'pool3',
              'conv4_2', 'pool5')
    ours = model.forward(x, layers)
    theirs = ref.forward(x_ref, layers)
    for layer in layers:
        got = _nchw(ours[layer])
        want = theirs[layer]
        assert got.shape == want.shape, layer
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3,
                                   err_msg=layer)


def test_vjp_matches_torch_backward(rng):
    params = random_params(4)
    model = VGG19Features(params)
    ref = oracle.OracleVGG(params)

    img = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    x = preprocess(img)
    layers = ('conv1_1', 'conv2_1', 'conv3_1')

    feats, vjp = model.features_and_vjp(x, layers)
    diffs = {l: rng.randn(*feats[l].shape).astype(np.float32) * 0.1
             for l in layers}
    grad = np.asarray(vjp({l: jnp.asarray(d) for l, d in diffs.items()}))

    _, backward = ref.forward_backward(ref.preprocess(img), layers)
    ref_grad = backward({l: _nchw(d) for l, d in diffs.items()})

    np.testing.assert_allclose(_nchw(grad), ref_grad, rtol=2e-3, atol=2e-4)


def test_forward_stops_at_deepest_layer(rng):
    params = random_params(0)
    model = VGG19Features(params)
    x = preprocess(rng.randint(0, 256, (8, 8, 3)).astype(np.uint8))
    feats = model.forward(x, ('conv1_1',))
    assert set(feats) == {'conv1_1'}
    assert feats['conv1_1'].shape == (1, 8, 8, 64)


@pytest.mark.parametrize('policy', [True, 'block'])
def test_remat_matches_plain(rng, policy):
    """Both remat policies (per-conv and per-block) must be numerically
    identical to the plain forward (same taps, same vjp)."""
    params = random_params(2)
    img = rng.randint(0, 256, (20, 20, 3)).astype(np.uint8)
    x = preprocess(img)
    layers = ('conv1_1', 'conv2_1', 'conv3_1')
    plain = VGG19Features(params)
    rem = VGG19Features(params, remat=policy)
    f_a, vjp_a = plain.features_and_vjp(x, layers)
    f_b, vjp_b = rem.features_and_vjp(x, layers)
    diffs = {l: jnp.asarray(rng.randn(*f_a[l].shape).astype(np.float32))
             for l in layers}
    for l in layers:
        np.testing.assert_allclose(np.asarray(f_a[l]), np.asarray(f_b[l]),
                                   rtol=1e-6)
    np.testing.assert_allclose(np.asarray(vjp_a(diffs)),
                               np.asarray(vjp_b(diffs)), rtol=1e-5, atol=1e-6)


def test_s2d_conv1_matches_direct(rng):
    """The space-to-depth rewrite of conv1_1 is the same linear map as the
    direct 3x3 conv (float32, both paths forced)."""
    from style_transfer2_tpu.models.vgg19 import _conv, _conv1_s2d
    w = jnp.asarray(rng.randn(3, 3, 3, 64).astype(np.float32))
    b = jnp.asarray(rng.randn(64).astype(np.float32))
    for h, wd in [(8, 8), (32, 16), (64, 64)]:
        x = jnp.asarray(rng.randn(1, h, wd, 3).astype(np.float32))
        direct = _conv(x, w, b, jax.lax.Precision.HIGHEST)
        s2d = _conv1_s2d(x, w, b, jax.lax.Precision.HIGHEST)
        np.testing.assert_allclose(np.asarray(s2d), np.asarray(direct),
                                   rtol=1e-4, atol=1e-4)
    # And the vjp (the step differentiates through it).
    x = jnp.asarray(rng.randn(1, 16, 16, 3).astype(np.float32))
    g = jnp.asarray(rng.randn(1, 16, 16, 64).astype(np.float32))
    gd = jax.vjp(lambda x_: _conv(x_, w, b, jax.lax.Precision.HIGHEST), x)[1](g)[0]
    gs = jax.vjp(lambda x_: _conv1_s2d(x_, w, b, jax.lax.Precision.HIGHEST), x)[1](g)[0]
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gd),
                               rtol=1e-4, atol=1e-4)


def test_s2d_bf16_features_parity(rng, monkeypatch):
    """With S2D_CONV1 forced on, bf16 extract_features at even sizes stays
    close to the f32 direct path."""
    from style_transfer2_tpu.models import vgg19
    monkeypatch.setattr(vgg19, 'S2D_CONV1', True)
    jax.clear_caches()  # the flag is read at trace time
    params = random_params(0)
    x = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32) * 20)
    f32 = vgg19.extract_features(params, x, ('conv1_1',))['conv1_1']
    bf16 = vgg19.extract_features(params, x, ('conv1_1',),
                                  jax.lax.Precision.DEFAULT,
                                  jnp.bfloat16)['conv1_1']
    scale = np.abs(np.asarray(f32)).mean()
    assert np.abs(np.asarray(bf16) - np.asarray(f32)).mean() < 0.03 * scale
    jax.clear_caches()


def test_pool_vjp_routes_to_first_argmax(rng, monkeypatch):
    """The custom pool vjp (POOL_ARGMAX_VJP forced on) routes gradient to the
    first max (Caffe/torch semantics), including on ties, and matches torch's
    max_pool2d backward."""
    from style_transfer2_tpu.models import vgg19
    monkeypatch.setattr(vgg19, 'POOL_ARGMAX_VJP', True)
    x = rng.randn(1, 6, 6, 4).astype(np.float32)
    x[0, 0, 0, 0] = x[0, 0, 1, 0] = x[0, 1, 0, 0] = 7.0  # tied window

    w = jnp.asarray(rng.randn(3, 3, 4).astype(np.float32))
    gj = np.asarray(jax.grad(
        lambda x_: jnp.sum(_max_pool_ceil(x_) * w))(jnp.asarray(x)))
    assert gj.shape == x.shape
    # Tied window: all gradient lands on the FIRST max position only.
    tied = gj[0, :2, :2, 0]
    assert tied[0, 0] != 0.0
    assert tied[0, 1] == 0.0 and tied[1, 0] == 0.0 and tied[1, 1] == 0.0

    # Full parity vs torch on untied random data.
    x2 = rng.randn(1, 5, 7, 3).astype(np.float32)
    g2 = rng.randn(1, 3, 4, 3).astype(np.float32)
    gj2 = np.asarray(jax.vjp(lambda x_: _max_pool_ceil(x_),
                             jnp.asarray(x2))[1](jnp.asarray(g2))[0])
    xt2 = torch.from_numpy(_nchw(x2)).requires_grad_(True)
    yt2 = F.max_pool2d(xt2, 2, 2, ceil_mode=True)
    yt2.backward(torch.from_numpy(_nchw(g2)))
    np.testing.assert_allclose(gj2, _nhwc(xt2.grad.numpy()), rtol=1e-6,
                               atol=1e-6)


def test_block1_s2d_feature_parity(rng, monkeypatch):
    """The whole-block-1 space-to-depth path (BLOCK1_S2D='always', f32)
    produces the same features as the direct path: conv taps up to a known
    pixel permutation (s2d layout), pool1 and deeper taps exactly."""
    from style_transfer2_tpu.models import vgg19
    params = random_params(0)
    x = jnp.asarray(rng.randn(1, 32, 48, 3).astype(np.float32) * 30)
    layers = ('conv1_1', 'conv1_2', 'pool1', 'conv2_1')
    monkeypatch.setattr(vgg19, 'BLOCK1_S2D', False)
    jax.clear_caches()
    direct = {k: np.asarray(v) for k, v in
              vgg19.extract_features(params, x, layers).items()}
    monkeypatch.setattr(vgg19, 'BLOCK1_S2D', 'always')
    jax.clear_caches()
    s2d = vgg19.extract_features(params, x, layers)
    for name in ('conv1_1', 'conv1_2'):
        assert s2d[name].shape == (1, 16, 24, 256)
        full = np.asarray(vgg19._depth_to_space(s2d[name], 64))
        np.testing.assert_allclose(full, direct[name], rtol=1e-4, atol=1e-3)
    for name in ('pool1', 'conv2_1'):
        assert s2d[name].shape == direct[name].shape
        np.testing.assert_allclose(np.asarray(s2d[name]), direct[name],
                                   rtol=1e-4, atol=1e-3)
    jax.clear_caches()


def test_block1_s2d_objective_parity(rng, monkeypatch):
    """Full objective (content + style + deepdream on block-1 layers, plus
    tv/p) agrees between the direct and block-1 s2d paths at f32: loss,
    gradient, and every trace scalar."""
    from style_transfer2_tpu.models import vgg19
    from style_transfer2_tpu.engine.objective import (
        ObjectiveSpec, empty_norms, make_objective, scalars_to_arrays,
        weights_to_arrays)
    from style_transfer2_tpu.ops.gram import gram_matrix
    params = random_params(0)
    content = jnp.asarray(rng.randn(1, 16, 24, 3).astype(np.float32) * 40)
    style = jnp.asarray(rng.randn(1, 16, 24, 3).astype(np.float32) * 40)
    x = jnp.asarray(rng.randn(1, 16, 24, 3).astype(np.float32) * 40)
    weights = {'content': {'conv1_2': 1.0, 'conv3_1': 0.5},
               'style': {'conv1_1': 1.0, 'conv2_1': 1.0},
               'deepdream': {'conv1_1': 0.3}}
    scal = {'tv': 2.0, 'p': 1.0}
    spec = ObjectiveSpec.from_weights(weights, scal)
    lw = {l: jnp.asarray(v) for l, v in
          weights_to_arrays(weights, spec).items()}
    sc = {k: jnp.asarray(v) for k, v in scalars_to_arrays(scal).items()}
    results = {}
    for flag in (False, 'always'):
        monkeypatch.setattr(vgg19, 'BLOCK1_S2D', flag)
        jax.clear_caches()
        model = vgg19.VGG19Features(params)
        cf = model.forward(content, spec.content_layers)
        sf = model.forward(style, spec.style_layers)
        grams = {l: gram_matrix(sf[l], channels=vgg19.layer_channels(l))
                 for l in spec.style_layers}
        obj = make_objective(spec, jax.lax.Precision.HIGHEST, jnp.float32)
        nv, ns = empty_norms(spec)
        loss, grad, _, trace = obj(params, x, cf, grams, lw, sc, nv, ns)
        results[flag] = (float(loss), np.asarray(grad),
                         np.float64([float(t) for t in trace]))
    jax.clear_caches()
    l0, g0, t0 = results[False]
    l1, g1, t1 = results['always']
    assert abs(l1 - l0) < 1e-4 * abs(l0)
    np.testing.assert_allclose(g1, g0, rtol=1e-3,
                               atol=1e-5 * np.abs(g0).max())
    np.testing.assert_allclose(t1, t0, rtol=1e-3)


def test_s2d_transform_forms_agree(rng, monkeypatch):
    """The 'slice' and 'transpose' forms of _space_to_depth are the same
    permutation (and _depth_to_space inverts both)."""
    from style_transfer2_tpu.models import vgg19
    x = jnp.asarray(rng.randn(2, 8, 12, 3).astype(np.float32))
    monkeypatch.setattr(vgg19, 'S2D_TRANSFORM', 'transpose')
    a = np.asarray(vgg19._space_to_depth(x))
    monkeypatch.setattr(vgg19, 'S2D_TRANSFORM', 'slice')
    b = np.asarray(vgg19._space_to_depth(x))
    np.testing.assert_array_equal(a, b)
    back = np.asarray(vgg19._depth_to_space(jnp.asarray(b), 3))
    np.testing.assert_array_equal(back, np.asarray(x))


def test_s2d_pool_forms_agree(rng, monkeypatch):
    """The 'slice' (pairwise maximum over channel blocks) and 'reshape'
    (5-D max) forms of the s2d-domain pool1 agree in values and input
    gradient (exact positive ties are measure-zero; all-zero ReLU ties
    split g/4 under both forms)."""
    from style_transfer2_tpu.models import vgg19
    params = random_params(0)
    x = jnp.asarray(rng.randn(1, 16, 24, 3).astype(np.float32) * 40)
    layers = ('pool1', 'conv2_1')
    results = {}
    for form in ('reshape', 'slice'):
        monkeypatch.setattr(vgg19, 'BLOCK1_S2D', 'always')
        monkeypatch.setattr(vgg19, 'S2D_POOL', form)
        jax.clear_caches()
        model = vgg19.VGG19Features(params)
        feats, vjp = model.features_and_vjp(x, layers)
        diffs = {l: jnp.asarray(np.ones(feats[l].shape, np.float32))
                 for l in layers}
        results[form] = ({l: np.asarray(feats[l]) for l in layers},
                         np.asarray(vjp(diffs)))
    jax.clear_caches()
    for l in layers:
        np.testing.assert_allclose(results['slice'][0][l],
                                   results['reshape'][0][l], rtol=1e-6)
    np.testing.assert_allclose(results['slice'][1], results['reshape'][1],
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize('policy', [True, 'block'])
def test_remat_matches_plain_bf16_s2d(rng, policy):
    """remat in bf16 at an even size (the high-res production combo, which
    takes the block-1 s2d path) is numerically identical to non-remat."""
    params = random_params(2)
    x = preprocess(rng.randint(0, 256, (32, 32, 3)).astype(np.uint8))
    layers = ('conv1_1', 'conv2_1', 'conv3_1')
    kw = dict(precision=jax.lax.Precision.DEFAULT,
              compute_dtype=jnp.bfloat16)
    plain = VGG19Features(params, **kw)
    rem = VGG19Features(params, remat=policy, **kw)
    f_a, vjp_a = plain.features_and_vjp(x, layers)
    f_b, vjp_b = rem.features_and_vjp(x, layers)
    assert f_a['conv1_1'].shape == (1, 16, 16, 256)  # s2d layout active
    diffs = {l: jnp.asarray(rng.randn(*f_a[l].shape).astype(np.float32))
             for l in layers}
    for l in layers:
        np.testing.assert_allclose(np.asarray(f_a[l]), np.asarray(f_b[l]),
                                   rtol=1e-6)
    np.testing.assert_allclose(np.asarray(vjp_a(diffs)),
                               np.asarray(vjp_b(diffs)), rtol=1e-5, atol=1e-5)


def test_bf16_odd_size_uses_direct_path(rng):
    """At odd sizes the bf16 trunk falls back to the direct convs (the s2d
    gate requires even H, W): taps keep full-res layout and track f32."""
    from style_transfer2_tpu.models import vgg19
    params = random_params(0)
    x = jnp.asarray(rng.randn(1, 31, 33, 3).astype(np.float32) * 20)
    f32 = vgg19.extract_features(params, x, ('conv1_1', 'pool1'))
    bf16 = vgg19.extract_features(params, x, ('conv1_1', 'pool1'),
                                  jax.lax.Precision.DEFAULT, jnp.bfloat16)
    assert bf16['conv1_1'].shape == (1, 31, 33, 64)   # no s2d layout
    assert bf16['pool1'].shape == f32['pool1'].shape  # ceil-mode (16, 17)
    for name in ('conv1_1', 'pool1'):
        scale = np.abs(np.asarray(f32[name])).mean()
        assert (np.abs(np.asarray(bf16[name]) - np.asarray(f32[name])).mean()
                < 0.03 * scale)

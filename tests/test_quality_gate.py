"""Real-weights quality gate (VERDICT r4 next-steps #6).

Every number in this repo was produced with deterministic RANDOM weights,
because the trained VGG-19 caffemodel's hosts are DNS-blocked in this
environment (download_models.sh:3 — reference download_models.sh:3 — and
the torchvision hub; re-probed each round). The conversion pipeline itself
is proven by construction (tests/test_weights.py: bit-exact caffemodel
roundtrip, interior-exact torchvision fold).

This module is the gate that fires AUTOMATICALLY the moment a weights file
lands at models/vgg19.npz or models/vgg19.caffemodel (resolve_params
'auto' discovery order), so the day egress opens costs zero extra work:

  1. golden trace parity of the fused JAX engine vs the independent
     torch/NumPy oracle — on the TRAINED weights (the random-weights
     golden tests cannot catch a weight-loading permutation that random
     weights are statistically blind to);
  2. an end-to-end stylization smoke: optimize a real photo against a
     real style image and assert transfer actually happened — style-Gram
     distance collapses vs the content image's, while a luminance-
     structure check (SSIM-class, computed here without external deps)
     keeps the content recognizable;
  3. the artifact is written next to the bench outputs for eyeballs.

Until then: skipped, with the reason below in the report.
"""

from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
_NPZ = REPO / 'models' / 'vgg19.npz'
_CAFFEMODEL = REPO / 'models' / 'vgg19.caffemodel'

WEIGHTS_PRESENT = _NPZ.exists() or _CAFFEMODEL.exists()

pytestmark = pytest.mark.skipif(
    not WEIGHTS_PRESENT,
    reason='trained VGG-19 weights absent (egress DNS-blocked, re-probed '
           'this round) — drop models/vgg19.npz or models/vgg19.caffemodel '
           'in place (see download_models.sh) and this gate activates '
           'automatically')


@pytest.fixture(scope='module')
def trained_params():
    from style_transfer2_tpu.models.weights import resolve_params
    params = resolve_params('auto', root=REPO)
    # Trained weights are distinguishable from the random fallback: VGG
    # biases are trained to substantial values; random_params draws them 0.
    assert any(float(np.abs(p['b']).max()) > 0.05 for p in params.values()), \
        'resolve_params fell back to random weights despite files present'
    return params


def _examples():
    from PIL import Image
    from style_transfer2_tpu.utils import resize_to_fit
    content = np.uint8(resize_to_fit(
        Image.open(REPO / 'examples' / 'golden_gate.jpg').convert('RGB'), 128))
    style = np.uint8(resize_to_fit(
        Image.open(REPO / 'examples' / 'starry_night.jpg').convert('RGB'), 128))
    return content, style


def test_trained_weights_golden_parity(trained_params):
    """Engine-vs-oracle trace parity on the TRAINED weights: catches any
    loading/conversion mismatch (channel permutation, HWIO/OIHW flip,
    caffe_scale fold) that the random-weights golden tests cannot."""
    import oracle
    from style_transfer2_tpu.engine import StyleTransfer

    rng = np.random.RandomState(0)
    content = rng.randint(0, 256, (32, 32, 3)).astype(np.uint8)
    style = rng.randint(0, 256, (32, 32, 3)).astype(np.uint8)
    inp = rng.randint(0, 256, (32, 32, 3)).astype(np.uint8)
    weights = {'content': {'conv4_2': 1.0},
               'style': {'conv1_1': 1.0, 'conv2_1': 1.0, 'conv3_1': 1.0}}
    scalars = {'tv': 5.0, 'tv_power': 2.0}

    st = StyleTransfer(trained_params)
    st.set_weights(weights, scalars)
    st.set_optimizer('lbfgs')
    st.set_step_size(1.0)
    st.set_content(content)
    st.set_style(style)
    st.set_input(inp)
    st.is_starting = True
    st._start()

    orc = oracle.OracleTransfer(trained_params, weights, scalars,
                                optimizer='lbfgs', step_size=1.0)
    orc.set_content(content)
    orc.set_style(style)
    orc.set_input(inp)

    for step in range(4):
        _, traces = st.run_steps(1, fetch_image=False)
        want = orc.step()
        got = traces[-1].data
        for key in want:
            if key in ('time', 'fevals'):
                continue
            np.testing.assert_allclose(
                got[key], want[key], rtol=2e-2,
                err_msg='trace key %r diverged at step %d on trained '
                        'weights' % (key, step))


def _gram_rgbless(feats):
    """Per-layer unit Grams from a dict of (1, H, W, C) float feature maps."""
    out = {}
    for name, f in feats.items():
        x = np.asarray(f, np.float64).reshape(-1, f.shape[-1])
        out[name] = x.T @ x / x.shape[0]
    return out


def _luminance(img):
    return np.asarray(img, np.float64) @ np.array([0.299, 0.587, 0.114])


def _structure_corr(a, b, pool=4):
    """SSIM-class structural check: correlation of locally-normalized
    pooled luminance (mean/contrast removed — pure structure)."""
    la, lb = _luminance(a), _luminance(b)
    h = (la.shape[0] // pool) * pool
    w = (la.shape[1] // pool) * pool

    def blocks(x):
        x = x[:h, :w].reshape(h // pool, pool, w // pool, pool)
        m = x.mean(axis=(1, 3), keepdims=True)
        return (x - m).reshape(-1)

    va, vb = blocks(la), blocks(lb)
    denom = np.linalg.norm(va) * np.linalg.norm(vb)
    return float(va @ vb / denom) if denom else 0.0


def test_trained_weights_stylization(trained_params, tmp_path):
    """End-to-end stylization on real weights: style Grams move decisively
    toward the style image's, content structure survives, and the snapshot
    is written for human review."""
    from PIL import Image
    from style_transfer2_tpu.engine import StyleTransfer
    from style_transfer2_tpu.models import vgg19

    content, style = _examples()
    weights = {'content': {'conv4_2': 0.02},
               'style': {'conv1_1': 1.0, 'conv2_1': 1.0, 'conv3_1': 1.0,
                         'conv4_1': 1.0, 'conv5_1': 1.0}}
    scalars = {'tv': 5.0, 'tv_power': 2.0}

    st = StyleTransfer(trained_params)
    st.set_weights(weights, scalars)
    st.set_optimizer('lbfgs')
    st.set_step_size(1.0)
    st.set_content(content)
    st.set_style(style)
    rng = np.random.RandomState(0)
    st.set_input(rng.uniform(0, 255, content.shape).astype(np.uint8))
    st.is_starting = True
    st._start()
    image, traces = st.run_steps(150)
    losses = [float(t.data['loss']) for t in traces]
    assert losses[-1] < 0.2 * losses[0], (losses[0], losses[-1])

    out = np.clip(image, 0, 255).astype(np.uint8)
    Image.fromarray(out).save(tmp_path / 'quality_gate_128.png')

    # Style actually transferred: the stylized image's feature Grams are
    # much closer to the style image's than the content image's were.
    style_layers = tuple(weights['style'])
    feats = {}
    for name, img in (('out', out), ('content', content), ('style', style)):
        x = vgg19.preprocess(img)
        feats[name] = _gram_rgbless(
            {k: np.asarray(v) for k, v in vgg19.extract_features(
                trained_params, x, style_layers,
                block1_s2d=False).items()})

    def gram_dist(a, b):
        return sum(float(np.mean((a[k] - b[k]) ** 2)) for k in style_layers)

    d_out = gram_dist(feats['out'], feats['style'])
    d_content = gram_dist(feats['content'], feats['style'])
    assert d_out < 0.35 * d_content, (d_out, d_content)

    # Content structure survives (and the output is not the content image).
    corr_content = _structure_corr(out, content)
    assert corr_content > 0.2, corr_content
    rms_vs_content = float(np.sqrt(np.mean(
        (np.float64(out) - np.float64(content)) ** 2)))
    assert rms_vs_content > 10.0, rms_vs_content

"""Weight-converter tests: the caffemodel protobuf wire parser against
synthetically encoded NetParameter bytes (both modern and legacy layer
encodings), the torchvision converter, and npz round-trips."""

import io

import numpy as np
import pytest

from style_transfer2_tpu.models.vgg19 import CONV_SPECS, _IN_CHANNELS
from style_transfer2_tpu.models.weights import (
    load_params,
    params_from_caffemodel,
    params_from_torchvision,
    random_params,
    resolve_params,
    save_params,
)


# -- minimal protobuf wire-format writer ---------------------------------------

def _varint(value):
    out = b''
    while True:
        bits = value & 0x7F
        value >>= 7
        if value:
            out += bytes([bits | 0x80])
        else:
            out += bytes([bits])
            return out


def _tag(field, wire_type):
    return _varint((field << 3) | wire_type)


def _len_delim(field, payload):
    return _tag(field, 2) + _varint(len(payload)) + payload


def _encode_blob(data, shape, legacy_dims=False):
    """BlobProto: packed float data (field 5) + BlobShape (field 7) or
    legacy num/channels/height/width (fields 1-4)."""
    out = b''
    if legacy_dims:
        for field, dim in zip((1, 2, 3, 4), shape):
            out += _tag(field, 0) + _varint(dim)
    else:
        dims = b''.join(_varint(d) for d in shape)
        out += _len_delim(7, _len_delim(1, dims))
    out += _len_delim(5, np.float32(data).tobytes())
    return out


def _encode_layer(name, blobs, modern=True):
    if modern:  # LayerParameter: name=1, type=2, blobs=7
        payload = _len_delim(1, name.encode())
        payload += _len_delim(2, b'Convolution')
        for blob in blobs:
            payload += _len_delim(7, blob)
        return _len_delim(100, payload)
    # V1LayerParameter: name=4, type=5 (enum), blobs=6
    payload = _len_delim(4, name.encode())
    payload += _tag(5, 0) + _varint(4)
    for blob in blobs:
        payload += _len_delim(6, blob)
    return _len_delim(2, payload)


def _make_caffemodel(rng, modern=True, legacy_dims=False):
    """Encodes a full truncated-VGG NetParameter; returns (bytes, params)."""
    out = _len_delim(1, b'vgg19_synthetic')
    expected = {}
    for layer_name, out_c in CONV_SPECS:
        in_c = _IN_CHANNELS[layer_name]
        w = rng.randn(out_c, in_c, 3, 3).astype(np.float32)  # Caffe OIHW
        b = rng.randn(out_c).astype(np.float32)
        blobs = [_encode_blob(w.ravel(), (out_c, in_c, 3, 3), legacy_dims),
                 _encode_blob(b, (out_c,), legacy_dims)]
        out += _encode_layer(layer_name, blobs, modern)
        expected[layer_name] = {
            'w': np.ascontiguousarray(w.transpose(2, 3, 1, 0)),  # HWIO
            'b': b,
        }
    return out, expected


@pytest.mark.parametrize('modern,legacy_dims', [
    (True, False), (False, False), (False, True)])
def test_caffemodel_parser_roundtrip(tmp_path, rng, modern, legacy_dims):
    data, expected = _make_caffemodel(rng, modern, legacy_dims)
    path = tmp_path / 'synthetic.caffemodel'
    path.write_bytes(data)
    params = params_from_caffemodel(path)
    assert set(params) == set(expected)
    for name in expected:
        np.testing.assert_array_equal(params[name]['w'], expected[name]['w'])
        np.testing.assert_array_equal(params[name]['b'], expected[name]['b'])


def test_caffemodel_missing_layer_raises(tmp_path, rng):
    data, _ = _make_caffemodel(rng)
    # Truncate: drop everything after the first few layers.
    path = tmp_path / 'broken.caffemodel'
    path.write_bytes(data[:len(data) // 4])
    with pytest.raises((ValueError, EOFError)):
        params_from_caffemodel(path)


def test_torchvision_conversion(rng):
    import torch
    state_dict = {}
    expected = {}
    idx_map = {'conv1_1': 0, 'conv1_2': 2, 'conv2_1': 5, 'conv2_2': 7,
               'conv3_1': 10, 'conv3_2': 12, 'conv3_3': 14, 'conv3_4': 16,
               'conv4_1': 19, 'conv4_2': 21, 'conv4_3': 23, 'conv4_4': 25,
               'conv5_1': 28, 'conv5_2': 30, 'conv5_3': 32, 'conv5_4': 34}
    for name, out_c in CONV_SPECS:
        in_c = _IN_CHANNELS[name]
        w = rng.randn(out_c, in_c, 3, 3).astype(np.float32)
        b = rng.randn(out_c).astype(np.float32)
        state_dict['features.%d.weight' % idx_map[name]] = torch.from_numpy(w)
        state_dict['features.%d.bias' % idx_map[name]] = torch.from_numpy(b)
        expected[name] = np.ascontiguousarray(w.transpose(2, 3, 1, 0))
    params = params_from_torchvision(state_dict)
    for name in expected:
        np.testing.assert_array_equal(params[name]['w'], expected[name])


def test_npz_roundtrip_and_resolve(tmp_path, rng):
    params = random_params(3)
    save_params(params, tmp_path / 'w.npz')
    loaded = load_params(tmp_path / 'w.npz')
    for name in params:
        np.testing.assert_array_equal(loaded[name]['w'], params[name]['w'])

    # resolve_params: explicit path, 'random', and auto-fallback.
    via_path = resolve_params(str(tmp_path / 'w.npz'))
    np.testing.assert_array_equal(via_path['conv1_1']['w'],
                                  params['conv1_1']['w'])
    rnd = resolve_params('random')
    assert rnd['conv5_4']['w'].shape == (3, 3, 512, 512)
    auto = resolve_params('auto', root=tmp_path)  # nothing there -> random
    np.testing.assert_array_equal(auto['conv1_1']['w'], rnd['conv1_1']['w'])


REAL_CAFFEMODEL = (
    __import__('pathlib').Path(__file__).resolve().parents[1]
    / 'models' / 'vgg19.caffemodel')


@pytest.mark.skipif(not REAL_CAFFEMODEL.exists(),
                    reason='models/vgg19.caffemodel not present (this CI '
                           'image has no egress; run download_models.sh)')
def test_real_caffemodel_end_to_end():
    """With the actual trained VGG-19 (download_models.sh), the parsed
    weights must carry trained-net statistics and drive a stylization whose
    loss decreases (reference worker.py:46-61 load path)."""
    from PIL import Image
    from style_transfer2_tpu.engine import StyleTransfer
    from style_transfer2_tpu.utils import resize_to_fit

    params = params_from_caffemodel(REAL_CAFFEMODEL)
    assert set(params) == {name for name, _ in CONV_SPECS}
    for name, out_c in CONV_SPECS:
        w = params[name]['w']
        assert w.shape == (3, 3, _IN_CHANNELS[name], out_c)
        assert 1e-4 < np.abs(w).mean() < 1.0   # trained-scale, not junk
        assert np.isfinite(w).all()

    root = REAL_CAFFEMODEL.parents[1]
    content = np.uint8(resize_to_fit(
        Image.open(root / 'examples/golden_gate.jpg').convert('RGB'), 96))
    style = np.uint8(resize_to_fit(
        Image.open(root / 'examples/starry_night.jpg').convert('RGB'), 96))
    st = StyleTransfer(params)
    st.set_weights({'content': {'conv4_2': 0.08},
                    'style': {'conv1_1': 1.0, 'conv2_1': 1.0,
                              'conv3_1': 1.0, 'conv4_1': 1.0},
                    'deepdream': {}},
                   {'p': 50.0, 'p_power': 6.0, 'tv': 5.0, 'tv_power': 2.0})
    st.set_optimizer('lbfgs')
    st.set_content(content)
    st.set_style(style)
    st.set_input(np.random.RandomState(0).uniform(
        0, 255, content.shape).astype(np.uint8))
    assert st.start()
    losses = [st.step()[1]['loss'] for _ in range(8)]
    assert np.isfinite(losses).all() and losses[-1] < losses[0]


def test_caffemodel_faithful_structure(tmp_path, rng):
    """A synthetic file with the REAL vgg19.caffemodel's layer structure —
    interleaved parameter-free ReLU/pool/dropout layers, plus fc6/fc7/fc8
    carrying their own blobs (legacy V1 encoding, like the file
    download_models.sh fetches) — parses to exactly the conv weights and
    ignores everything else (reference load path worker.py:46-61)."""
    out = _len_delim(1, b'VGG_ILSVRC_19_layers')
    expected = {}
    block_of = {}
    for layer_name, _ in CONV_SPECS:
        block_of.setdefault(layer_name[4], []).append(layer_name)
    for block, convs in sorted(block_of.items()):
        for conv in convs:
            in_c = _IN_CHANNELS[conv]
            out_c = dict(CONV_SPECS)[conv]
            w = rng.randn(out_c, in_c, 3, 3).astype(np.float32)
            b = rng.randn(out_c).astype(np.float32)
            out += _encode_layer(conv, [
                _encode_blob(w.ravel(), (out_c, in_c, 3, 3),
                             legacy_dims=True),
                _encode_blob(b, (out_c,), legacy_dims=True)], modern=False)
            out += _encode_layer('relu' + conv[4:], [], modern=False)
            expected[conv] = {
                'w': np.ascontiguousarray(w.transpose(2, 3, 1, 0)), 'b': b}
        out += _encode_layer('pool%s' % block, [], modern=False)
    # FC layers carry blobs the parser must skip without reshaping (their
    # true shapes don't fit any conv layer). Scaled-down data, real names.
    for fc, shape in (('fc6', (4096, 512)), ('fc7', (4096, 409)),
                      ('fc8', (1000, 40))):
        w = rng.randn(*shape).astype(np.float32)
        out += _encode_layer(fc, [
            _encode_blob(w.ravel(), shape, legacy_dims=True),
            _encode_blob(np.zeros(shape[0], np.float32), (shape[0],),
                         legacy_dims=True)], modern=False)
        out += _encode_layer('drop' + fc[2:], [], modern=False)
    path = tmp_path / 'faithful.caffemodel'
    path.write_bytes(out)
    params = params_from_caffemodel(path)
    assert set(params) == set(expected)
    for name in expected:
        np.testing.assert_array_equal(params[name]['w'], expected[name]['w'])
        np.testing.assert_array_equal(params[name]['b'], expected[name]['b'])


# -- Full-scale caffemodel writing + the torchvision caffe_scale fold ----------

def test_write_caffemodel_full_scale_roundtrip(tmp_path):
    """write_caffemodel -> params_from_caffemodel is bit-exact on a
    FULL-SCALE model (every conv at its real width — the file is the same
    ~80 MB of float32 the real truncated caffemodel carries), in both the
    legacy V1 encoding the real file uses and the modern one."""
    from style_transfer2_tpu.models.weights import write_caffemodel

    params = random_params(11)
    for modern in (False, True):
        path = tmp_path / ('full_%s.caffemodel' % modern)
        write_caffemodel(params, path, modern=modern)
        assert path.stat().st_size > 70e6   # genuinely full scale
        loaded = params_from_caffemodel(path)
        assert set(loaded) == set(params)
        for name in params:
            np.testing.assert_array_equal(loaded[name]['w'],
                                          np.float32(params[name]['w']))
            np.testing.assert_array_equal(loaded[name]['b'],
                                          np.float32(params[name]['b']))


def _torch_vgg19_features(rng):
    """The torchvision vgg19().features stack, built in plain torch (no
    torchvision in this image) to the public layout: conv indices
    0,2 / 5,7 / 10,12,14,16 / 19,21,23,25 / 28,30,32,34 with 2x2 pools."""
    import torch
    import torch.nn as nn
    cfg = [64, 64, 'M', 128, 128, 'M', 256, 256, 256, 256, 'M',
           512, 512, 512, 512, 'M', 512, 512, 512, 512, 'M']
    layers = []
    in_c = 3
    for v in cfg:
        if v == 'M':
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(in_c, v, 3, padding=1))
            layers.append(nn.ReLU())
            in_c = v
    seq = nn.Sequential(*layers)
    with torch.no_grad():
        for mod in seq:
            if isinstance(mod, nn.Conv2d):
                mod.weight.copy_(torch.from_numpy(
                    (rng.randn(*mod.weight.shape) * 0.05).astype(np.float32)))
                mod.bias.copy_(torch.from_numpy(
                    (rng.randn(*mod.bias.shape) * 0.05).astype(np.float32)))
    return seq


def test_caffe_scale_fold_matches_torch_pipeline(rng):
    """params_from_torchvision(caffe_scale=True) folds torchvision's input
    normalization into conv1_1: the engine's Caffe-style preprocessing then
    produces the SAME activations torchvision's own pipeline would — the
    property that makes a torchvision-sourced caffemodel run at its trained
    operating point. Interior-exact; the border ring differs because
    SAME-padding zeros mean different raw values in the two input spaces."""
    import torch
    from style_transfer2_tpu.models import preprocess
    from style_transfer2_tpu.models.vgg19 import VGG19Features

    seq = _torch_vgg19_features(rng)
    params = params_from_torchvision(seq.state_dict(), caffe_scale=True)

    raw = rng.randint(0, 256, (64, 64, 3)).astype(np.uint8)
    mean = torch.tensor([0.485, 0.456, 0.406])[:, None, None]
    std = torch.tensor([0.229, 0.224, 0.225])[:, None, None]
    p = torch.from_numpy(
        raw.transpose(2, 0, 1)[None].astype(np.float32) / 255.0)
    t = (p - mean) / std
    with torch.no_grad():
        torch_c11 = seq[:2](t).numpy()     # conv1_1 + relu
        torch_c31 = seq[:12](t).numpy()    # through conv3_1 + relu

    model = VGG19Features(params)
    ours = model.forward(preprocess(raw), ('conv1_1', 'conv3_1'))

    ours_c11 = np.transpose(np.asarray(ours['conv1_1'])[0], (2, 0, 1))[None]
    np.testing.assert_allclose(ours_c11[..., 1:-1, 1:-1],
                               torch_c11[..., 1:-1, 1:-1],
                               rtol=1e-4, atol=1e-4)
    # Border contamination reaches 3 pixels at conv3_1's 16x16 resolution.
    ours_c31 = np.transpose(np.asarray(ours['conv3_1'])[0], (2, 0, 1))[None]
    np.testing.assert_allclose(ours_c31[..., 3:-3, 3:-3],
                               torch_c31[..., 3:-3, 3:-3],
                               rtol=1e-3, atol=1e-3)

    # Without the fold, the same raw image lands far off the trained
    # operating point (the 0-255-scale caveat the fold exists to fix).
    plain = params_from_torchvision(seq.state_dict())
    far = VGG19Features(plain).forward(preprocess(raw), ('conv1_1',))
    far_c11 = np.transpose(np.asarray(far['conv1_1'])[0], (2, 0, 1))[None]
    assert np.abs(far_c11).mean() > 10 * np.abs(torch_c11).mean()


def test_auto_resolve_written_caffemodel_stylizes(tmp_path):
    """resolve_params('auto') discovers a write_caffemodel-produced file
    exactly like the reference's downloaded one (worker.py:46-61) and the
    engine stylizes with it end to end."""
    from style_transfer2_tpu.engine import StyleTransfer
    from style_transfer2_tpu.models.weights import write_caffemodel

    (tmp_path / 'models').mkdir()
    write_caffemodel(random_params(1), tmp_path / 'models/vgg19.caffemodel')
    params = resolve_params('auto', root=tmp_path)
    np.testing.assert_array_equal(params['conv1_1']['w'],
                                  np.float32(random_params(1)['conv1_1']['w']))

    rng = np.random.RandomState(0)
    content = rng.randint(0, 256, (48, 48, 3)).astype(np.uint8)
    style = rng.randint(0, 256, (48, 48, 3)).astype(np.uint8)
    st = StyleTransfer(params)
    st.set_weights({'content': {'conv4_2': 0.08},
                    'style': {'conv1_1': 1.0, 'conv2_1': 1.0},
                    'deepdream': {}},
                   {'p': 50.0, 'p_power': 6.0, 'tv': 5.0, 'tv_power': 2.0})
    st.set_optimizer('lbfgs')
    st.set_content(content)
    st.set_style(style)
    st.set_input(rng.uniform(0, 255, content.shape).astype(np.uint8))
    assert st.start()
    losses = [st.step()[1]['loss'] for _ in range(5)]
    assert np.isfinite(losses).all() and losses[-1] < losses[0]

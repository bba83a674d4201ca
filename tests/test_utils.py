"""Unit tests for utils: size ladder, square fitting, DecayingMean, Trace,
config layering (SURVEY.md §4.2)."""

import numpy as np

from style_transfer2_tpu.utils import DecayingMean, Trace, fit_into_square, scales
from style_transfer2_tpu.utils.config import read_config


def test_scales_ladder():
    sizes = scales((512, 384), min_size=32)
    assert sizes[-1] == (512, 384)
    # increasing, roughly sqrt(2) apart
    for a, b in zip(sizes, sizes[1:]):
        assert a[0] < b[0] and a[1] < b[1]
        assert 1.3 < b[0] / a[0] < 1.5
    assert min(sizes[0]) >= 24  # first rung near min_size


def test_scales_square():
    sizes = scales((256, 256), min_size=1)
    assert sizes[0] == (1, 1)
    assert sizes[-1] == (256, 256)


def test_fit_into_square():
    # no scale-up by default
    assert fit_into_square((100, 50), 200) == (100, 50)
    assert fit_into_square((100, 50), 200, scale_up=True) == (200, 100)
    assert fit_into_square((400, 300), 200) == (200, 150)
    assert fit_into_square((300, 400), 200) == (150, 200)


def test_decaying_mean_bias_correction():
    m = DecayingMean(0.9)
    assert m() == 0
    m(1.0)
    assert np.isclose(m(), 1.0)  # fully bias-corrected after one item
    m(2.0)
    expected = (0.9 * (1 - 0.9) * 1.0 + (1 - 0.9) * 2.0) / (1 - 0.9 ** 2)
    assert np.isclose(m(), expected)
    m.clear()
    assert m() == 0
    assert m.items == 0


def test_decaying_mean_arrays():
    m = DecayingMean(0.5)
    m(np.array([2.0, 4.0]))
    assert np.allclose(m(), [2.0, 4.0])


def test_trace_dedup_and_types():
    t = Trace()
    t('a', np.float32(1.5))
    t('a', 2.5)
    t('a', 3.5)
    assert list(t.data.keys()) == ['a', 'a_', 'a__']
    assert all(isinstance(v, float) for v in t.data.values())
    rms_in = np.array([3.0, 4.0], np.float32)
    out = t.rms('r', rms_in)
    assert out is rms_in
    assert np.isclose(t.data['r'], np.sqrt(12.5))


def test_config_layering(tmp_path):
    extra = tmp_path / 'override.ini'
    extra.write_text('[DEFAULT]\nhttp_port = 9999\n')

    class Args:
        config = str(extra)
        debug = 0

    config = read_config(Args())
    assert config['http_port'] == '9999'       # CLI config wins
    assert 'initial_content' in config          # base config still present

"""Analytic roofline model (utils/perfmodel.py): internal consistency and
agreement with the FLOPs accounting bench.py uses for MFU."""

import numpy as np

from style_transfer2_tpu.utils.perfmodel import (
    CHIPS, model_step, mxu_efficiency)


def test_mxu_efficiency():
    assert mxu_efficiency(128, 128) == 1.0
    assert mxu_efficiency(256, 128) == 1.0
    assert abs(mxu_efficiency(27, 64) - (27 / 128) * (64 / 128)) < 1e-12
    # Padding waste: K=129 occupies two tiles.
    assert abs(mxu_efficiency(129, 128) - 129 / 256) < 1e-12
    assert 0 < mxu_efficiency(576, 3) < 0.05   # conv1_1 input-grad


def test_model_relations():
    hw = (384, 512)
    f32 = model_step(hw, 'float32')
    bf16 = model_step(hw, 'bfloat16')
    assert f32.flops == bf16.flops                 # precision-independent
    assert f32.hbm_bytes == 2 * bf16.hbm_bytes     # dtype bytes halve
    assert f32.t_floor > bf16.t_floor

    big = model_step((768, 1024), 'bfloat16')
    assert 3.5 < big.flops / bf16.flops < 4.5      # ~quadratic in size

    remat = model_step(hw, 'bfloat16', remat='conv')
    block = model_step(hw, 'bfloat16', remat='block')
    assert remat.flops == block.flops > bf16.flops  # +1x forward recompute
    assert block.hbm_bytes < remat.hbm_bytes        # fewer residual saves

    # A measured step can't beat the floor in the model's own accounting.
    assert f32.sol_at(19.0e-3) < 1.0
    assert 0.2 < bf16.sol_at(5.09e-3) < 1.0
    assert abs(bf16.mfu_at(5.09e-3)
               - bf16.flops / CHIPS['v5e']['bf16_flops'] / 5.09e-3) < 1e-9


def test_matches_bench_flops_accounting():
    """The raw FLOPs total must match bench.py's step_flops model (same
    conv + gram accounting) for the same objective, sans remat."""
    from style_transfer2_tpu.models.vgg19 import BLOB_NAMES, blob_index
    hw = (384, 512)
    m = model_step(hw, 'float32', content_layers=('conv4_2',),
                   style_layers=('conv1_1', 'conv2_1', 'conv3_1',
                                 'conv4_1', 'conv5_1'))
    # Recompute the bench-style total inline (bench.step_flops needs a live
    # engine; the arithmetic is the contract).
    from style_transfer2_tpu.models.vgg19 import CONV_SPECS, layer_channels
    deepest = blob_index('conv5_1')
    h, w = hw
    c_in, total = 3, 0.0
    chans = dict(CONV_SPECS)
    for name in BLOB_NAMES[1:deepest + 1]:
        if name.startswith('conv'):
            c_out = chans[name]
            total += 2 * 2.0 * h * w * 9 * c_in * c_out
            c_in = c_out
        else:
            h, w = -(-h // 2), -(-w // 2)
    feat_hw = {}
    hh, ww = hw
    for name in BLOB_NAMES[1:]:
        if name.startswith('pool'):
            hh, ww = -(-hh // 2), -(-ww // 2)
        feat_hw[name] = (hh, ww)
    for layer in ('conv1_1', 'conv2_1', 'conv3_1', 'conv4_1', 'conv5_1'):
        hh, ww = feat_hw[layer]
        c = layer_channels(layer)
        total += 2 * 2.0 * hh * ww * c * c
    np.testing.assert_allclose(m.flops, total, rtol=1e-12)


def test_sharded_model():
    """The sharded extension (VERDICT r4 #7): n=1 degenerates to the
    single-chip model; per-device work scales ~1/n while ICI terms grow;
    the 4K-regime prediction beats one chip by a wide margin."""
    from style_transfer2_tpu.utils.perfmodel import model_step_sharded

    hw = (2560, 3840)
    one = model_step_sharded(hw, 1, remat=False)
    assert one.t_ici == 0 and one.n_collectives == 0
    assert abs(one.t_floor - model_step(hw, 'bfloat16').t_floor) < 1e-12

    m4 = model_step_sharded(hw, 4)
    m8 = model_step_sharded(hw, 8)
    base = model_step_sharded(hw, 1)
    # Near-linear compute scaling (per-device walk at H/n).
    assert 3.5 < base.per_chip.t_compute / m4.per_chip.t_compute < 4.5
    assert 1.7 < m4.per_chip.t_compute / m8.per_chip.t_compute < 2.3
    # ICI terms are real but small at 4K: halos are single rows.
    assert 0 < m4.t_ici < m8.t_ici
    assert m8.t_ici < 0.2 * m8.t_floor
    assert m8.halo_bytes > m4.halo_bytes     # deeper grids still sharded
    # End to end: 8 chips >= 5x one chip at this size, and the floor is
    # the local roofline plus the ICI serial term.
    assert base.t_floor / m8.t_floor > 5.0
    assert abs(m8.t_floor
               - (max(m8.per_chip.t_compute, m8.per_chip.t_memory)
                  + m8.t_ici)) < 1e-12
    assert m8.bound in ('compute', 'memory', 'ici')

    # Latency-dominated regime: a tiny grid sharded 8 ways is ici-bound.
    tiny = model_step_sharded((256, 256), 8)
    assert tiny.t_ici / tiny.t_floor > 0.2


def test_cli_table(capsys):
    import sys
    sys.path.insert(0, 'tools')
    import perf_model
    perf_model.main(['--json'])
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) > 20
    import json
    rows = [json.loads(line) for line in out]
    r512 = next(r for r in rows if r['size'] == 512
                and r['precision'] == 'bfloat16')
    assert 0 < r512['pct_of_sol'] < 100
    assert r512['bound'] in ('compute', 'memory')

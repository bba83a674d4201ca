"""Multi-device tests on the virtual 8-CPU mesh (SURVEY.md §4.4): spatial
sharding of the fused step, batched (vmapped) serving lanes, mesh helpers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from style_transfer2_tpu.engine import StyleTransfer
from style_transfer2_tpu.engine.objective import (
    ObjectiveSpec, empty_norms, scalars_to_arrays, weights_to_arrays)
from style_transfer2_tpu.engine.steps import build_step_core
from style_transfer2_tpu.models import random_params, preprocess
from style_transfer2_tpu.models.vgg19 import VGG19Features
from style_transfer2_tpu.ops.gram import gram_matrix
from style_transfer2_tpu.optim import adam
from style_transfer2_tpu.parallel import (
    DataPlacement, SpatialPlacement, build_batched_step_fns, make_mesh,
    stack_lanes, unstack_lane)

WEIGHTS = {
    'content': {'conv2_2': 0.1},
    'style': {'conv1_1': 1.0, 'conv2_1': 1.0},
    'deepdream': {},
}
SCALARS = {'p': 50.0, 'p_power': 6.0, 'tv': 5.0, 'tv_power': 2.0}


def test_make_mesh_shapes():
    assert len(jax.devices()) == 8
    m = make_mesh('auto')
    assert m.devices.shape == (8,)
    m = make_mesh('2x4')
    assert m.devices.shape == (2, 4)
    assert m.axis_names == ('data', 'space')
    m = make_mesh(4)
    assert m.devices.shape == (4,)
    with pytest.raises(ValueError):
        make_mesh('4x4')


def _run_transfer(placement, n_steps=3, optimizer='adam'):
    rng = np.random.RandomState(3)
    st = StyleTransfer(random_params(2), placement=placement)
    st.set_weights(WEIGHTS, SCALARS)
    st.set_optimizer(optimizer)
    st.set_step_size(10.0 if optimizer == 'adam' else 1.0)
    st.set_content(rng.randint(0, 256, (32, 32, 3)).astype(np.uint8))
    st.set_style(rng.randint(0, 256, (32, 32, 3)).astype(np.uint8))
    st.set_input(rng.randint(0, 256, (32, 32, 3)).astype(np.uint8))
    assert st.start()
    traces = []
    img = None
    for _ in range(n_steps):
        img, trace = st.step()
        traces.append(trace)
    return img, traces


@pytest.mark.parametrize('optimizer', ['adam', 'lbfgs'])
def test_spatial_sharding_matches_single_device(optimizer):
    mesh = make_mesh('2x4')
    placement = SpatialPlacement(mesh)  # H axis over 4 devices
    img_sharded, traces_sharded = _run_transfer(placement, optimizer=optimizer)
    img_single, traces_single = _run_transfer(None, optimizer=optimizer)

    for ts, tu in zip(traces_sharded, traces_single):
        for key in tu:
            if key in ('time',):
                continue
            np.testing.assert_allclose(
                ts[key], tu[key], rtol=5e-4, atol=1e-6,
                err_msg='trace key %r diverged under spatial sharding' % key)
    np.testing.assert_allclose(img_sharded, img_single, rtol=1e-3, atol=0.1)


def test_spatial_sharding_actually_shards():
    mesh = make_mesh('2x4')
    placement = SpatialPlacement(mesh)
    x = placement.image(jnp.zeros((1, 64, 64, 3)))
    shard_shapes = {s.data.shape for s in x.addressable_shards}
    assert shard_shapes == {(1, 16, 64, 3)}  # 64 rows over 4 'space' devices
    # The shaped L-BFGS history (n_corr, 1, H, W, C) shards on the same
    # H axis as the iterate — a replicated history would be 10
    # image-sized buffers per device.
    hist = placement.state({'sk': jnp.zeros((10, 1, 64, 64, 3))})['sk']
    shard_shapes = {s.data.shape for s in hist.addressable_shards}
    assert shard_shapes == {(10, 1, 16, 64, 3)}


def _lane_inputs(st, spec):
    return st._gather_inputs(spec)


def test_batched_lanes_match_single(rng):
    """vmapped lanes with per-lane weights/step sizes == independent runs."""
    params = random_params(2)
    spec = ObjectiveSpec.from_weights(WEIGHTS, SCALARS)
    step_core, _ = build_step_core(spec, 'adam')
    model = VGG19Features(params)

    lanes = []
    for i in range(3):
        r = np.random.RandomState(10 + i)
        content = preprocess(r.randint(0, 256, (24, 24, 3)))
        style = preprocess(r.randint(0, 256, (24, 24, 3)))
        inp = preprocess(r.randint(0, 256, (24, 24, 3)))
        feats = model.forward(content)
        grams = {l: gram_matrix(f) for l, f in model.forward(style).items()}
        weights = {k: dict(v) for k, v in WEIGHTS.items()}
        weights['style']['conv1_1'] = 1.0 + i  # per-lane weight values
        nv, ns = empty_norms(spec)
        inputs = {
            'content_feats': {l: feats[l] for l in spec.content_layers},
            'grams': {l: grams[l] for l in spec.style_layers},
            'layer_weights': weights_to_arrays(weights, spec),
            'scalars': scalars_to_arrays(SCALARS),
            'norms_vals': nv, 'norms_set': ns,
        }
        lanes.append({'state': adam.init(inp), 'inputs': inputs,
                      'step_size': jnp.float32(5.0 + i)})

    # Reference: independent single-lane steps (2 iterations each).
    single = []
    for lane in lanes:
        state, inputs = lane['state'], lane['inputs']
        for _ in range(2):
            state, norms, trace = step_core(params, state, inputs,
                                            lane['step_size'])
            inputs = dict(inputs)
            inputs['norms_vals'], inputs['norms_set'] = norms
        single.append((state, trace))

    # Batched: stacked lanes, 2 iterations.
    batched_step, _ = build_batched_step_fns(spec, 'adam')
    states = stack_lanes([l['state'] for l in lanes])
    inputs = stack_lanes([l['inputs'] for l in lanes])
    step_sizes = jnp.stack([l['step_size'] for l in lanes])
    for _ in range(2):
        states, norms, traces = batched_step(params, states, inputs,
                                             step_sizes)
        inputs = dict(inputs)
        inputs['norms_vals'], inputs['norms_set'] = norms

    for i, (state_ref, trace_ref) in enumerate(single):
        lane_state = unstack_lane(states, i)
        # vmap reorders conv reductions; tolerance covers float32 noise.
        np.testing.assert_allclose(np.asarray(lane_state['x']),
                                   np.asarray(state_ref['x']),
                                   rtol=3e-4, atol=1e-4)
        for k, (got, want) in enumerate(zip(jax.device_get(traces),
                                            jax.device_get(trace_ref))):
            np.testing.assert_allclose(
                got[i], want, rtol=1e-4, atol=1e-6,
                err_msg='lane %d trace #%d (%s)' % (i, k, spec.trace_keys[k]))


def test_batched_lanes_sharded_over_data_axis(rng):
    """The stacked lane axis shards over the mesh 'data' axis and the
    batched step runs SPMD."""
    params = random_params(2)
    spec = ObjectiveSpec.from_weights(WEIGHTS, SCALARS)
    model = VGG19Features(params)
    mesh = make_mesh('2x4')
    placement = DataPlacement(mesh)

    lanes = []
    for i in range(2):
        r = np.random.RandomState(20 + i)
        content = preprocess(r.randint(0, 256, (16, 16, 3)))
        style = preprocess(r.randint(0, 256, (16, 16, 3)))
        inp = preprocess(r.randint(0, 256, (16, 16, 3)))
        feats = model.forward(content)
        grams = {l: gram_matrix(f) for l, f in model.forward(style).items()}
        nv, ns = empty_norms(spec)
        inputs = {
            'content_feats': {l: feats[l] for l in spec.content_layers},
            'grams': {l: grams[l] for l in spec.style_layers},
            'layer_weights': weights_to_arrays(WEIGHTS, spec),
            'scalars': scalars_to_arrays(SCALARS),
            'norms_vals': nv, 'norms_set': ns,
        }
        lanes.append({'state': adam.init(inp), 'inputs': inputs})

    states = placement.place(stack_lanes([l['state'] for l in lanes]))
    inputs = placement.place(stack_lanes([l['inputs'] for l in lanes]))
    step_sizes = placement.place(jnp.ones((2,), jnp.float32) * 5.0)

    batched_step, _ = build_batched_step_fns(spec, 'adam')
    states, norms, traces = batched_step(params, states, inputs, step_sizes)
    loss_idx = spec.trace_keys.index('loss')
    losses = np.asarray(traces[loss_idx])
    assert losses.shape == (2,)
    assert np.isfinite(losses).all()


def test_spatial_sharding_with_scan():
    """run_steps (fused scan) under spatial placement: the donated sharded
    state threads through the scan and matches single-device traces."""
    mesh = make_mesh('2x4')
    placement = SpatialPlacement(mesh)

    def run(pl):
        rng = np.random.RandomState(7)
        st = StyleTransfer(random_params(2), placement=pl)
        st.set_weights(WEIGHTS, SCALARS)
        st.set_optimizer('adam')
        st.set_step_size(10.0)
        st.set_content(rng.randint(0, 256, (32, 32, 3)).astype(np.uint8))
        st.set_style(rng.randint(0, 256, (32, 32, 3)).astype(np.uint8))
        st.set_input(rng.randint(0, 256, (32, 32, 3)).astype(np.uint8))
        assert st.start()
        img, trace = st.run_steps(3)
        return img, trace

    img_s, trace_s = run(placement)
    img_u, trace_u = run(None)
    for key in trace_u:
        if key == 'time':
            continue
        np.testing.assert_allclose(trace_s[key], trace_u[key],
                                   rtol=5e-4, atol=1e-6, err_msg=key)
    np.testing.assert_allclose(img_s, img_u, rtol=1e-3, atol=0.1)


def _run_transfer_prec(placement, precision, n_steps=3, block1_s2d=None,
                       remat=False):
    rng = np.random.RandomState(3)
    st = StyleTransfer(random_params(2), precision=precision,
                       placement=placement, block1_s2d=block1_s2d,
                       remat=remat)
    st.set_weights(WEIGHTS, SCALARS)
    st.set_optimizer('lbfgs')
    st.set_step_size(1.0)
    st.set_content(rng.randint(0, 256, (32, 32, 3)).astype(np.uint8))
    st.set_style(rng.randint(0, 256, (32, 32, 3)).astype(np.uint8))
    st.set_input(rng.randint(0, 256, (32, 32, 3)).astype(np.uint8))
    assert st.start()
    traces = []
    img = None
    for _ in range(n_steps):
        img, trace = st.step()
        traces.append(trace)
    return img, traces


def test_spatial_sharding_bf16_block1_s2d():
    """Under spatial sharding the block-1 space-to-depth path is gated OFF
    by default (its 1.22x win is single-chip-only until the sharded A/B
    runs on hardware — ADVICE r2); the gated sharded run must still track
    the unsharded bf16 run, which DOES use s2d (the two paths are the same
    math). block1_s2d=True forces the path on under sharding — the
    hardware A/B configuration — and must also compile and track."""
    mesh = make_mesh('2x4')
    assert StyleTransfer(random_params(2), precision='bfloat16',
                         placement=SpatialPlacement(mesh)).block1_s2d is False
    assert StyleTransfer(random_params(2),
                         precision='bfloat16').block1_s2d is True

    img_sh, traces_sh = _run_transfer_prec(SpatialPlacement(mesh), 'bfloat16')
    img_un, traces_un = _run_transfer_prec(None, 'bfloat16')
    for ts, tu in zip(traces_sh, traces_un):
        assert np.isfinite(ts['loss'])
        np.testing.assert_allclose(ts['loss'], tu['loss'], rtol=2e-2)
    assert img_sh.shape == img_un.shape
    np.testing.assert_allclose(img_sh, img_un, rtol=0.1, atol=3.0)

    img_f, traces_f = _run_transfer_prec(SpatialPlacement(mesh), 'bfloat16',
                                         block1_s2d=True)
    for tf, tu in zip(traces_f, traces_un):
        np.testing.assert_allclose(tf['loss'], tu['loss'], rtol=2e-2)
    np.testing.assert_allclose(img_f, img_un, rtol=0.1, atol=3.0)


@pytest.mark.parametrize('policy', ['conv', 'block'])
def test_spatial_sharding_remat_policies(policy):
    """The 3K/4K production combo — bf16 + rematerialization + spatial
    sharding — must track the unsharded non-remat run for both policies:
    checkpoint boundaries segment the forward, but the recomputed backward
    is the same math even when each segment's H axis is sharded (the
    checkpointed segments recompute shard-locally; GSPMD re-inserts the
    same halo exchanges in the recompute)."""
    mesh = make_mesh('2x4')
    img_r, traces_r = _run_transfer_prec(SpatialPlacement(mesh), 'bfloat16',
                                         remat=policy)
    img_un, traces_un = _run_transfer_prec(None, 'bfloat16')
    for tr, tu in zip(traces_r, traces_un):
        assert np.isfinite(tr['loss'])
        np.testing.assert_allclose(tr['loss'], tu['loss'], rtol=2e-2)
    np.testing.assert_allclose(img_r, img_un, rtol=0.1, atol=3.0)


def test_batched_engine_bf16_block1_s2d():
    """The batched (vmapped) engine in bf16 at an even size — the pooled
    serving configuration that exercises s2d under vmap — steps cleanly
    with per-lane traces tracking independent bf16 engines."""
    from style_transfer2_tpu.engine.batched import BatchedStyleTransfer
    params = random_params(2)
    rng = np.random.RandomState(5)
    imgs = [[rng.randint(0, 256, (32, 32, 3)).astype(np.uint8)
             for _ in range(3)] for _ in range(2)]
    eng = BatchedStyleTransfer(params, WEIGHTS, SCALARS, (32, 32),
                               max_lanes=2, optimizer='lbfgs',
                               precision='bfloat16')
    for content, style, inp in imgs:
        eng.add_job(content, style, inp)
    per_lane = [[] for _ in range(2)]
    for _ in range(3):
        for lane, tr in eng.step_all().items():
            per_lane[lane].append(tr)

    for lane, (content, style, inp) in enumerate(imgs):
        st = StyleTransfer(params, precision='bfloat16')
        st.set_weights(WEIGHTS, SCALARS)
        st.set_optimizer('lbfgs')
        st.set_step_size(1.0)
        st.set_content(content)
        st.set_style(style)
        st.set_input(inp)
        assert st.start()
        for i in range(3):
            _, tr = st.step()
            np.testing.assert_allclose(per_lane[lane][i]['loss'], tr['loss'],
                                       rtol=2e-2)


def test_spatial_sharding_uneven_h_falls_back_to_w():
    """H % n_shards != 0 must still shard (VERDICT r2 #4): the placement
    falls back to the W axis instead of silently replicating."""
    mesh = make_mesh(4, axis_names=('space',))
    placement = SpatialPlacement(mesh)
    x = placement.image(jnp.zeros((1, 66, 64, 3)))
    shard_shapes = {s.data.shape for s in x.addressable_shards}
    assert shard_shapes == {(1, 66, 16, 3)}  # 64 cols over 4 devices
    # 5-D (L-BFGS history) rank takes the same fallback.
    h = placement.state(jnp.zeros((5, 1, 66, 64, 3)))
    shard_shapes = {s.data.shape for s in h.addressable_shards}
    assert shard_shapes == {(5, 1, 66, 16, 3)}


def test_spatial_sharding_uneven_h_matches_single_device():
    """Full-engine equivalence on a W-sharded grid (H indivisible)."""
    hw = (34, 32)
    rng = np.random.RandomState(5)
    imgs = [rng.randint(0, 256, hw + (3,)).astype(np.uint8)
            for _ in range(3)]

    def run(placement):
        st = StyleTransfer(random_params(2), placement=placement)
        st.set_weights(WEIGHTS, SCALARS)
        st.set_optimizer('adam')
        st.set_step_size(10.0)
        st.set_content(imgs[0])
        st.set_style(imgs[1])
        st.set_input(imgs[2])
        assert st.start()
        traces = []
        for _ in range(2):
            img, trace = st.step()
            traces.append(trace)
        return img, traces

    mesh = make_mesh(4, axis_names=('space',))
    img_s, traces_s = run(SpatialPlacement(mesh))
    img_u, traces_u = run(None)
    for ts, tu in zip(traces_s, traces_u):
        for key in tu:
            if key == 'time':
                continue
            np.testing.assert_allclose(
                ts[key], tu[key], rtol=5e-4, atol=1e-6,
                err_msg='trace key %r diverged under W sharding' % key)
    np.testing.assert_allclose(img_s, img_u, rtol=1e-3, atol=0.1)


def test_snap_hw():
    mesh = make_mesh(8, axis_names=('space',))
    p = SpatialPlacement(mesh)
    assert p.snap_hw((1030, 771)) == (1032, 776)
    assert p.snap_hw((1024, 768)) == (1024, 768)
    assert p.snap_hw((3, 5)) == (8, 8)   # never below one row per shard


def test_spatial_replication_fallback_is_loud(caplog):
    """Large arrays that replicate (neither axis divides) warn once;
    small deep-pyramid features replicate silently by design."""
    import logging

    mesh = make_mesh(4, axis_names=('space',))
    p = SpatialPlacement(mesh)
    big = jnp.zeros((1, 2049, 2049, 4))  # 67 MB, both axes indivisible
    with caplog.at_level(logging.WARNING, logger='parallel'):
        p.image(big)
        p.image(big)  # warned once per shape
    warned = [r for r in caplog.records if 'REPLICATION' in r.message]
    assert len(warned) == 1

    caplog.clear()
    with caplog.at_level(logging.WARNING, logger='parallel'):
        p.image(jnp.zeros((1, 3, 3, 512)))
    assert not caplog.records

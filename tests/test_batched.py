"""BatchedStyleTransfer tests: lane independence vs the single-lane engine,
lane lifecycle, per-lane weight changes, L-BFGS priming, data-sharded mesh."""

import numpy as np
import pytest

from style_transfer2_tpu.engine import StyleTransfer
from style_transfer2_tpu.engine.batched import BatchedStyleTransfer
from style_transfer2_tpu.models import random_params
from style_transfer2_tpu.parallel import DataPlacement, make_mesh

WEIGHTS = {'content': {'conv2_2': 0.1},
           'style': {'conv1_1': 1.0, 'conv2_1': 1.0}, 'deepdream': {}}
SCALARS = {'p': 50.0, 'p_power': 6.0, 'tv': 5.0, 'tv_power': 2.0}
HW = (24, 24)


def _job(seed):
    rng = np.random.RandomState(seed)
    return {k: rng.randint(0, 256, HW + (3,)).astype(np.uint8)
            for k in ('content', 'style', 'input')}


def _single_reference(params, job, weights, step_size, optimizer, n_steps):
    st = StyleTransfer(params)
    st.set_weights(weights, SCALARS)
    st.set_optimizer(optimizer)
    st.set_step_size(step_size)
    st.set_content(job['content'])
    st.set_style(job['style'])
    st.set_input(job['input'])
    assert st.start()
    trace = None
    for _ in range(n_steps):
        img, trace = st.step()
    return img, trace


@pytest.mark.parametrize('optimizer', ['adam', 'lbfgs'])
def test_lanes_match_single_engine(optimizer):
    params = random_params(6)
    bt = BatchedStyleTransfer(params, WEIGHTS, SCALARS, HW, max_lanes=3,
                              optimizer=optimizer)
    jobs = [_job(i) for i in range(2)]
    per_lane_weights = [WEIGHTS,
                        {'content': {'conv2_2': 0.3},
                         'style': {'conv1_1': 2.0, 'conv2_1': 1.0},
                         'deepdream': {}}]
    step_sizes = [1.0, 0.5] if optimizer == 'lbfgs' else [10.0, 5.0]
    lanes = [bt.add_job(j['content'], j['style'], j['input'],
                        weights=w, step_size=ss)
             for j, w, ss in zip(jobs, per_lane_weights, step_sizes)]
    assert lanes == [0, 1]

    traces = None
    for _ in range(3):
        traces = bt.step_all()
    assert set(traces) == {0, 1}

    for lane, (job, w, ss) in enumerate(zip(jobs, per_lane_weights,
                                            step_sizes)):
        ref_img, ref_trace = _single_reference(params, job, w, ss,
                                               optimizer, 3)
        got = traces[lane]
        for key in ref_trace:
            if key == 'time':
                continue
            np.testing.assert_allclose(
                got[key], ref_trace[key], rtol=5e-4, atol=1e-5,
                err_msg='lane %d key %s (%s)' % (lane, key, optimizer))
        np.testing.assert_allclose(bt.lane_image(lane), ref_img,
                                   rtol=1e-3, atol=0.1)


def test_lane_lifecycle_and_weight_change():
    params = random_params(6)
    bt = BatchedStyleTransfer(params, WEIGHTS, SCALARS, HW, max_lanes=2,
                              optimizer='adam')
    j0, j1 = _job(0), _job(1)
    l0 = bt.add_job(j0['content'], j0['style'], j0['input'])
    l1 = bt.add_job(j1['content'], j1['style'], j1['input'])
    assert bt.free_lane() is None
    with pytest.raises(RuntimeError):
        bt.add_job(j0['content'], j0['style'], j0['input'])

    bt.step_all()
    bt.remove_job(l0)
    assert bt.free_lane() == l0
    traces = bt.step_all()
    assert l0 not in traces and l1 in traces
    assert traces[l1]['fevals'] == 2

    # Per-lane weight-value change: lane keeps iterating, loss stays finite.
    new_w = {'content': {'conv2_2': 0.5},
             'style': {'conv1_1': 1.5, 'conv2_1': 1.0}, 'deepdream': {}}
    bt.set_lane_weights(l1, new_w, SCALARS)
    traces = bt.step_all()
    assert np.isfinite(traces[l1]['loss'])

    # A structurally different objective is rejected (bucket mismatch).
    bad_w = {'content': {'conv3_2': 0.5}, 'style': {'conv1_1': 1.0},
             'deepdream': {}}
    with pytest.raises(ValueError):
        bt.set_lane_weights(l1, bad_w, SCALARS)

    # A freed lane is reusable.
    l0b = bt.add_job(j0['content'], j0['style'], j0['input'])
    assert l0b == l0
    traces = bt.step_all()
    assert traces[l0]['fevals'] == 1


def test_batched_on_data_mesh():
    mesh = make_mesh('2x4')
    placement = DataPlacement(mesh)
    params = random_params(6)
    bt = BatchedStyleTransfer(params, WEIGHTS, SCALARS, HW, max_lanes=2,
                              optimizer='adam', placement=placement)
    for i in range(2):
        j = _job(i)
        bt.add_job(j['content'], j['style'], j['input'])
    traces = bt.step_all()
    assert len(traces) == 2
    assert all(np.isfinite(t['loss']) for t in traces.values())
    img = bt.lane_image(0)
    assert img.shape == HW + (3,)


def test_run_steps_all_matches_step_all():
    """The batched scan (K fused steps) must match K separate batched
    steps trace-for-trace."""
    params = random_params(6)
    jobs = [_job(i) for i in range(2)]

    def make():
        bt = BatchedStyleTransfer(params, WEIGHTS, SCALARS, HW, max_lanes=2,
                                  optimizer='adam')
        for j in jobs:
            bt.add_job(j['content'], j['style'], j['input'])
        return bt

    a, b = make(), make()
    a_traces = {0: [], 1: []}
    for _ in range(3):
        for lane, t in a.step_all().items():
            a_traces[lane].append(t)
    b_traces = b.run_steps_all(3)

    for lane in (0, 1):
        assert len(b_traces[lane]) == 3
        for ta, tb in zip(a_traces[lane], b_traces[lane]):
            for key in ta:
                np.testing.assert_allclose(
                    ta[key], tb[key], rtol=1e-5, atol=1e-7,
                    err_msg='lane %d key %s' % (lane, key))
    np.testing.assert_allclose(a.lane_image(0), b.lane_image(0),
                               rtol=1e-5, atol=1e-4)


def test_run_steps_all_respects_pause():
    params = random_params(6)
    bt = BatchedStyleTransfer(params, WEIGHTS, SCALARS, HW, max_lanes=2,
                              optimizer='adam')
    for i in range(2):
        j = _job(i)
        bt.add_job(j['content'], j['style'], j['input'])
    bt.set_running(0, False)
    img0_before = bt.lane_image(0)
    traces = bt.run_steps_all(2)
    assert 0 not in traces and 1 in traces
    assert bt.t == [0, 2]
    np.testing.assert_array_equal(bt.lane_image(0), img0_before)


def test_paused_lane_weight_change_reprimes_on_resume():
    """Regression: L-BFGS priming must be PER-LANE. A lane whose objective
    changes while paused must re-prime its (loss, grad) cache when it
    resumes — not inherit a prime pass that ran while it was masked out
    (reference semantics: optimizers.py:62-65,121-125 evaluate before any
    step whenever objective_changed)."""
    params = random_params(6)
    j0, j1 = _job(0), _job(1)
    new_w = {'content': {'conv2_2': 0.4},
             'style': {'conv1_1': 1.5, 'conv2_1': 0.5}, 'deepdream': {}}

    bt = BatchedStyleTransfer(params, WEIGHTS, SCALARS, HW, max_lanes=2,
                              optimizer='lbfgs')
    l0 = bt.add_job(j0['content'], j0['style'], j0['input'])
    l1 = bt.add_job(j1['content'], j1['style'], j1['input'])
    for _ in range(2):
        bt.step_all()
    # Pause lane 1, change its weights (stale cache), step lane 0 a few
    # times (this used to clear the engine-wide priming flag), resume.
    bt.set_running(l1, False)
    bt.set_lane_weights(l1, new_w, SCALARS)
    assert bt._needs_prime[l1] and not bt._needs_prime[l0]
    for _ in range(2):
        traces = bt.step_all()
        assert l1 not in traces
    assert bt._needs_prime[l1], 'paused lane lost its priming mark'
    bt.set_running(l1, True)
    resumed = [bt.step_all()[l1] for _ in range(2)]

    # Never-paused reference for lane 1: same job, 2 steps, weight change,
    # 2 more steps on the single-lane engine.
    st = StyleTransfer(params)
    st.set_weights(WEIGHTS, SCALARS)
    st.set_optimizer('lbfgs')
    st.set_step_size(1.0)
    st.set_content(j1['content'])
    st.set_style(j1['style'])
    st.set_input(j1['input'])
    assert st.start()
    for _ in range(2):
        st.step()
    st.set_weights(new_w, SCALARS)
    expected = []
    for _ in range(2):
        _, trace = st.step()
        expected.append(trace)

    for got, ref in zip(resumed, expected):
        for key in ref:
            if key == 'time':
                continue
            np.testing.assert_allclose(
                got[key], ref[key], rtol=5e-4, atol=1e-5,
                err_msg='post-resume trace key %s' % key)

"""Golden end-to-end parity: the fused JAX engine vs. the independent
NumPy/torch oracle, iteration by iteration (SURVEY.md §4.1).

Runs both implementations from identical inputs for N iterations and asserts
the full loss/gradient traces and the output images match within float32
tolerance. Exercises: Adam and L-BFGS, the first-eval norm cache, mid-run
weight changes (objective_changed semantics), and reset.
"""

import numpy as np
import pytest

import oracle
from style_transfer2_tpu.engine import StyleTransfer
from style_transfer2_tpu.models import random_params

SIZE = (32, 32)

WEIGHTS = {
    'content': {'conv3_2': 0.08},
    'style': {'conv1_1': 1.0, 'conv2_1': 1.0, 'conv3_1': 1.0},
    'deepdream': {'conv2_2': 0.3},
}
SCALARS = {'p': 50.0, 'p_power': 6.0, 'tv': 5.0, 'tv_power': 2.0}


def _images(rng):
    content = rng.randint(0, 256, SIZE + (3,)).astype(np.uint8)
    style = rng.randint(0, 256, SIZE + (3,)).astype(np.uint8)
    inp = rng.randint(0, 256, SIZE + (3,)).astype(np.uint8)
    return content, style, inp


def _build_engine(params, optimizer, step_size):
    st = StyleTransfer(params)
    st.set_weights(WEIGHTS, SCALARS)
    st.set_optimizer(optimizer)
    st.set_step_size(step_size)
    return st


def _build_oracle(params, optimizer, step_size):
    return oracle.OracleTransfer(params, WEIGHTS, SCALARS,
                                 optimizer=optimizer, step_size=step_size)


def _assert_traces_match(got, want, step, rtol):
    assert list(got.keys()) == [k for k in got if True]  # ordered dict sanity
    for key in want:
        if key in ('time', 'fevals'):
            continue
        assert key in got, 'missing trace key %r at step %d' % (key, step)
        np.testing.assert_allclose(
            got[key], want[key], rtol=rtol,
            err_msg='trace key %r diverged at step %d' % (key, step))


@pytest.mark.parametrize('optimizer,step_size,n_steps,rtol', [
    ('adam', 10.0, 5, 5e-3),
    ('lbfgs', 1.0, 5, 5e-3),
])
def test_trace_parity(rng, optimizer, step_size, n_steps, rtol):
    params = random_params(7)
    content, style, inp = _images(rng)

    st = _build_engine(params, optimizer, step_size)
    st.set_content(content)
    st.set_style(style)
    st.set_input(inp)
    assert st.start()

    ref = _build_oracle(params, optimizer, step_size)
    ref.set_content(content)
    ref.set_style(style)
    ref.set_input(inp)

    for step in range(n_steps):
        img, trace = st.step()
        ref_img, ref_trace = ref.step()
        _assert_traces_match(trace, ref_trace, step, rtol)
        np.testing.assert_allclose(img, ref_img, rtol=1e-2, atol=0.75,
                                   err_msg='image diverged at step %d' % step)


def test_norm_cache_first_eval_only(rng):
    params = random_params(7)
    content, style, inp = _images(rng)
    st = _build_engine(params, 'adam', 10.0)
    st.set_content(content)
    st.set_style(style)
    st.set_input(inp)
    st.start()
    st.step()
    norms_after_1 = {k: float(v) for k, v in st.norm_vals.items()}
    st.step()
    norms_after_2 = {k: float(v) for k, v in st.norm_vals.items()}
    # Norms freeze at the first evaluation and survive later steps.
    assert norms_after_1 == norms_after_2
    assert all(v > 0 for v in norms_after_1.values())

    # reset() clears them; the next step recomputes different values.
    st.reset()
    assert st.norm_vals == {}
    st.is_starting = True
    st._start()
    st.step()
    assert any(not np.isclose(float(st.norm_vals[k]), norms_after_1[k])
               for k in st.norm_vals)


def test_midrun_weight_change_parity(rng):
    params = random_params(9)
    content, style, inp = _images(rng)

    st = _build_engine(params, 'adam', 10.0)
    ref = _build_oracle(params, 'adam', 10.0)
    for obj in (st, ref):
        obj.set_content(content)
        obj.set_style(style)
        obj.set_input(inp)
    st.start()

    for _ in range(2):
        st.step()
        ref.step()

    new_weights = {
        'content': {'conv3_2': 0.2},
        'style': {'conv1_1': 2.0, 'conv2_1': 1.0, 'conv3_1': 1.0},
        'deepdream': {'conv2_2': 0.3},
    }
    st.set_weights(new_weights, SCALARS)
    ref.weights = new_weights
    ref.optimizer.objective_changed()

    for step in range(3):
        _, trace = st.step()
        _, ref_trace = ref.step()
        _assert_traces_match(trace, ref_trace, step, rtol=5e-3)


def test_lbfgs_midrun_optimizer_swap(rng):
    # Swapping optimizer type mid-run resets the optimizer but keeps norms
    # (worker.py:387-391 resets only on class change; reset() clears norms —
    # the worker calls transfer.reset() which clears norms too).
    params = random_params(5)
    content, style, inp = _images(rng)
    st = _build_engine(params, 'adam', 10.0)
    st.set_content(content)
    st.set_style(style)
    st.set_input(inp)
    st.start()
    st.step()

    st.set_optimizer('lbfgs')
    st.set_step_size(1.0)
    st.reset()
    st.is_starting = True
    st._start()
    img, trace = st.step()
    assert np.isfinite(trace['loss'])
    assert trace['fevals'] == 1  # reset() zeroed the iterate count

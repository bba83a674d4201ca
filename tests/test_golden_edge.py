"""Golden edge cases: losses on the 'data' blob (pixel-domain), pool-layer
losses, deepdream-only objectives, and warm-start resample semantics."""

import numpy as np

import oracle
from style_transfer2_tpu.engine import StyleTransfer
from style_transfer2_tpu.models import random_params

SCALARS = {'p': 50.0, 'p_power': 6.0, 'tv': 5.0, 'tv_power': 2.0}


def _pair(weights, rng, optimizer='adam', step_size=10.0, hw=(24, 24)):
    params = random_params(8)
    content = rng.randint(0, 256, hw + (3,)).astype(np.uint8)
    style = rng.randint(0, 256, hw + (3,)).astype(np.uint8)
    inp = rng.randint(0, 256, hw + (3,)).astype(np.uint8)

    st = StyleTransfer(params)
    st.set_weights(weights, SCALARS)
    st.set_optimizer(optimizer)
    st.set_step_size(step_size)
    st.set_content(content)
    st.set_style(style)
    st.set_input(inp)
    assert st.start()

    ref = oracle.OracleTransfer(params, weights, SCALARS,
                                optimizer=optimizer, step_size=step_size)
    ref.set_content(content)
    ref.set_style(style)
    ref.set_input(inp)
    return st, ref


def _compare(st, ref, n_steps, rtol=5e-3):
    for step in range(n_steps):
        _, trace = st.step()
        _, ref_trace = ref.step()
        for key in ref_trace:
            if key in ('time', 'fevals'):
                continue
            np.testing.assert_allclose(trace[key], ref_trace[key], rtol=rtol,
                                       err_msg='%s @ step %d' % (key, step))


def test_data_blob_losses(rng):
    """Content/style losses on the 'data' blob operate in pixel space
    (possible in the reference since layers() includes 'data')."""
    weights = {'content': {'data': 0.5, 'conv1_1': 0.1},
               'style': {'data': 1.0}, 'deepdream': {}}
    st, ref = _pair(weights, rng)
    _compare(st, ref, 3)


def test_pool_layer_losses(rng):
    weights = {'content': {'pool1': 0.2},
               'style': {'pool2': 1.0, 'conv2_1': 1.0}, 'deepdream': {}}
    st, ref = _pair(weights, rng)
    _compare(st, ref, 3)


def test_deepdream_only(rng):
    weights = {'content': {}, 'style': {},
               'deepdream': {'conv2_2': 1.0, 'conv3_1': 0.5}}
    st, ref = _pair(weights, rng)
    _compare(st, ref, 3)


def test_adam_resample_warm_start_semantics(rng):
    """Mid-run resolution change: Adam's second moment survives the resample
    (bilinear, clamped), the first moment clears via objective_changed, and
    stepping continues cleanly at the new size — the reference's
    resample_input path (worker.py:154-160, optimizers.py:29-47)."""
    weights = {'content': {'conv2_2': 0.1}, 'style': {'conv1_1': 1.0},
               'deepdream': {}}
    st, _ = _pair(weights, rng)
    for _ in range(3):
        st.step()
    g2_items_before = int(st.opt_state['g2_items'])
    norms_before = {k: float(v) for k, v in st.norm_vals.items()}

    st.resample_input((32, 32))
    st.resample_content((32, 32))
    assert st.input_hw == (32, 32)
    assert int(st.opt_state['g1_items']) == 0          # cleared
    assert int(st.opt_state['g2_items']) == g2_items_before  # survives
    assert float(np.min(np.asarray(st.opt_state['g2_mean']))) >= 0.0

    st.is_starting = True
    st._start()
    _, trace = st.step()
    assert np.isfinite(trace['loss'])
    # norms persist across size changes (cleared only by reset).
    for k, v in norms_before.items():
        assert np.isclose(float(st.norm_vals[k]), v), k


def test_lbfgs_resample_clears_history(rng):
    weights = {'content': {'conv2_2': 0.1}, 'style': {'conv1_1': 1.0},
               'deepdream': {}}
    st, _ = _pair(weights, rng, optimizer='lbfgs', step_size=1.0)
    for _ in range(4):
        st.step()
    assert int(st.opt_state['count']) > 0
    st.resample_input((32, 32))
    st.resample_content((32, 32))
    assert int(st.opt_state['count']) == 0
    assert st._needs_init
    st.is_starting = True
    st._start()
    _, trace = st.step()
    assert np.isfinite(trace['loss'])


def test_structure_change_recomputes_content_features(rng):
    """Adding a content layer mid-run must lazily recompute its features
    from the stored content image — trace parity with the oracle (which
    stores all features up front) proves the values are identical."""
    weights_a = {'content': {'conv2_2': 0.1}, 'style': {'conv1_1': 1.0},
                 'deepdream': {}}
    weights_b = {'content': {'conv2_2': 0.1, 'conv3_2': 0.4},
                 'style': {'conv1_1': 1.0, 'conv2_1': 0.5}, 'deepdream': {}}
    st, ref = _pair(weights_a, rng)
    for _ in range(2):
        st.step()
        ref.step()
    st.set_weights(weights_b, SCALARS)
    ref.weights = weights_b
    ref.optimizer.objective_changed()
    _compare(st, ref, 3)


def test_nondefault_exponents(rng):
    """tv_power/p_power away from the fast-path constants — the static
    exponents in the spec must still match the oracle."""
    weights = {'content': {'conv2_2': 0.1}, 'style': {'conv1_1': 1.0},
               'deepdream': {}}
    scalars = {'p': 10.0, 'p_power': 3.0, 'tv': 2.0, 'tv_power': 1.5}
    st, ref = _pair(weights, rng)
    st.set_weights(weights, scalars)
    ref.scalar_params = scalars
    ref.optimizer.objective_changed()
    _compare(st, ref, 3)

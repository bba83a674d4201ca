"""bfloat16 mode: runs end-to-end and stays within coarse agreement of the
float32 (reference-exact) path — the documented speed/accuracy trade."""

import numpy as np

from style_transfer2_tpu.engine import StyleTransfer
from style_transfer2_tpu.models import random_params

WEIGHTS = {'content': {'conv2_2': 0.1},
           'style': {'conv1_1': 1.0, 'conv2_1': 1.0}, 'deepdream': {}}
SCALARS = {'p': 50.0, 'p_power': 6.0, 'tv': 5.0, 'tv_power': 2.0}


def _run(precision, optimizer, n_steps=3):
    rng = np.random.RandomState(2)
    st = StyleTransfer(random_params(4), precision=precision)
    st.set_weights(WEIGHTS, SCALARS)
    st.set_optimizer(optimizer)
    st.set_step_size({'adam': 10.0, 'lbfgs': 1.0}[optimizer])
    st.set_content(rng.randint(0, 256, (24, 24, 3)).astype(np.uint8))
    st.set_style(rng.randint(0, 256, (24, 24, 3)).astype(np.uint8))
    st.set_input(rng.randint(0, 256, (24, 24, 3)).astype(np.uint8))
    assert st.start()
    traces = []
    img = None
    for _ in range(n_steps):
        img, trace = st.step()
        traces.append(trace)
    return img, traces


def test_bf16_tracks_f32():
    for optimizer in ('adam', 'lbfgs'):
        img32, traces32 = _run('float32', optimizer)
        img16, traces16 = _run('bfloat16', optimizer)
        assert list(traces16[0].keys()) == list(traces32[0].keys())
        # Step 1 evaluates both paths at the SAME iterate: bf16 features give
        # ~1% loss deviations. Later steps compound through the optimizer, so
        # only coarse agreement holds.
        for step, (t16, t32) in enumerate(zip(traces16, traces32)):
            rtol = 0.1 if step == 0 else 0.75
            for key in t32:
                if key in ('time', 'fevals'):
                    continue
                np.testing.assert_allclose(
                    t16[key], t32[key], rtol=rtol,
                    err_msg='%s/%s@%d' % (optimizer, key, step))
        assert np.isfinite(img16).all()
        # images stay visually close at these few steps
        rms = np.sqrt(np.mean((img16 - img32) ** 2))
        assert rms < 8.0, rms


def test_bf16_feed_full_trace_tracks_bf16():
    """BF16_FEED rewrites every loss branch (content/style/deepdream) as
    scalar-folded bf16 contractions — EVERY trace key (losses, gradient
    RMS values, total) must track the unflagged bf16 trajectory, and the
    content-feature store dtype must follow the flag."""
    import jax.numpy as jnp

    from style_transfer2_tpu.engine import objective
    from style_transfer2_tpu.engine.steps import build_step_core

    orig = objective.BF16_FEED
    weights = {'content': {'conv2_2': 0.1},
               'style': {'conv1_1': 1.0, 'conv2_1': 1.0},
               'deepdream': {'conv3_1': 0.05}}

    def run(flag):
        objective.BF16_FEED = flag
        build_step_core.cache_clear()
        try:
            rng = np.random.RandomState(7)
            st = StyleTransfer(random_params(5), precision='bfloat16')
            st.set_weights(weights, SCALARS)
            st.set_optimizer('lbfgs')
            st.set_step_size(1.0)
            st.set_content(rng.randint(0, 256, (24, 24, 3)).astype(np.uint8))
            st.set_style(rng.randint(0, 256, (24, 24, 3)).astype(np.uint8))
            st.set_input(rng.randint(0, 256, (24, 24, 3)).astype(np.uint8))
            assert st.start()
            expected = (jnp.bfloat16 if flag else jnp.float32)
            assert all(f.dtype == expected for f in st.features.values())
            traces = [st.step()[1] for _ in range(3)]
            return traces
        finally:
            objective.BF16_FEED = orig
            build_step_core.cache_clear()

    base = run(False)
    feed = run(True)
    for step, (tf, tb) in enumerate(zip(feed, base)):
        rtol = 0.1 if step == 0 else 0.75
        for key in tb:
            if key in ('time', 'fevals'):
                continue
            np.testing.assert_allclose(tf[key], tb[key], rtol=rtol,
                                       err_msg='%s@%d' % (key, step))


def test_style_fold_tracks_feed():
    """STYLE_FOLD folds the style scale into the (c, c) gram_diff BEFORE
    the gradient matmul and derives rms(s_raw) in the Gram domain
    (sumsq(s_raw)/size == sum((gd @ gd) * gram), verified exactly) — the
    big-tensor scalar multiply (a measured 1.32 ms/step layout-flip copy
    at 2048px bf16) and the full-tensor sum-of-squares pass both cease to
    exist. Same math, bf16-level rounding differences only; float32
    parity is untouched by construction (bf16_feed-only branch)."""
    from style_transfer2_tpu.engine import objective
    from style_transfer2_tpu.engine.steps import build_step_core

    orig = objective.STYLE_FOLD

    def run(flag, precision):
        objective.STYLE_FOLD = flag
        build_step_core.cache_clear()
        try:
            return _run(precision, 'lbfgs')
        finally:
            objective.STYLE_FOLD = orig
            build_step_core.cache_clear()

    base_img, base = run(False, 'bfloat16')
    fold_img, fold = run(True, 'bfloat16')
    assert list(fold[0].keys()) == list(base[0].keys())
    for step, (tf, tb) in enumerate(zip(fold, base)):
        rtol = 0.1 if step == 0 else 0.75
        for key in tb:
            if key in ('time', 'fevals'):
                continue
            np.testing.assert_allclose(tf[key], tb[key], rtol=rtol,
                                       err_msg='%s@%d' % (key, step))
    assert np.sqrt(np.mean((fold_img - base_img) ** 2)) < 8.0

    # float32 parity: bit-exact regardless of the flag.
    img32, traces32 = run(False, 'float32')
    img32f, traces32f = run(True, 'float32')
    np.testing.assert_array_equal(img32f, img32)
    for tf, t32 in zip(traces32f, traces32):
        for key in t32:
            if key in ('time',):
                continue
            np.testing.assert_array_equal(tf[key], t32[key], err_msg=key)


def test_style_fold_auto_gate():
    """The shipped STYLE_FOLD default is 'auto': fold only for grids of at
    least STYLE_FOLD_MIN_PIXELS per-image pixels (the part-12 hardware arms
    inverted below ~1024px). The gate resolves at trace time to EXACTLY the
    explicit branch: bit-identical programs, bit-identical outputs."""
    from style_transfer2_tpu.engine import objective
    from style_transfer2_tpu.engine.steps import build_step_core

    orig_flag = objective.STYLE_FOLD
    orig_min = objective.STYLE_FOLD_MIN_PIXELS

    def run(flag, min_pixels):
        objective.STYLE_FOLD = flag
        objective.STYLE_FOLD_MIN_PIXELS = min_pixels
        build_step_core.cache_clear()
        try:
            return _run('bfloat16', 'lbfgs')
        finally:
            objective.STYLE_FOLD = orig_flag
            objective.STYLE_FOLD_MIN_PIXELS = orig_min
            build_step_core.cache_clear()

    # Above the floor (24x24 = 576 px >= 1): auto == explicit True.
    img_auto, traces_auto = run('auto', 1)
    img_true, traces_true = run(True, 1)
    np.testing.assert_array_equal(img_auto, img_true)
    # Below the floor (the shipped 500k): auto == explicit False.
    img_auto, traces_auto = run('auto', orig_min)
    img_false, traces_false = run(False, orig_min)
    np.testing.assert_array_equal(img_auto, img_false)
    for ta, tf in zip(traces_auto, traces_false):
        for key in tf:
            if key in ('time',):
                continue
            np.testing.assert_array_equal(ta[key], tf[key], err_msg=key)


def test_float32_fast_mode():
    """float32_fast (DEFAULT matmul precision, f32 state) runs end-to-end
    and tracks parity float32 — on the CPU backend the precisions coincide,
    so agreement is tight; on TPU it is the measured speed/quality knob."""
    img_fast, traces_fast = _run('float32_fast', 'lbfgs')
    img32, traces32 = _run('float32', 'lbfgs')
    for tf, t32 in zip(traces_fast, traces32):
        for key in t32:
            if key in ('time', 'fevals'):
                continue
            np.testing.assert_allclose(tf[key], t32[key], rtol=1e-4,
                                       err_msg=key)
    assert np.sqrt(np.mean((img_fast - img32) ** 2)) < 1.0


def _run_remat(remat, n_steps=3):
    rng = np.random.RandomState(3)
    st = StyleTransfer(random_params(4), precision='bfloat16', remat=remat)
    st.set_weights(WEIGHTS, SCALARS)
    st.set_optimizer('lbfgs')
    st.set_step_size(1.0)
    st.set_content(rng.randint(0, 256, (24, 24, 3)).astype(np.uint8))
    st.set_style(rng.randint(0, 256, (24, 24, 3)).astype(np.uint8))
    st.set_input(rng.randint(0, 256, (24, 24, 3)).astype(np.uint8))
    assert st.start()
    img = None
    losses = []
    for _ in range(n_steps):
        img, trace = st.step()
        losses.append(trace['loss'])
    return img, losses


def test_remat_policies_track_plain():
    """Both remat policies ('conv' per-conv, 'block' per-block checkpoints)
    run the bf16 engine end-to-end and track the non-remat trajectory — the
    recomputed backward is the same math, so agreement is tight."""
    img_p, loss_p = _run_remat(False)
    for policy in ('conv', 'block'):
        img_r, loss_r = _run_remat(policy)
        np.testing.assert_allclose(loss_r, loss_p, rtol=1e-3,
                                   err_msg=str(policy))
        rms = np.sqrt(np.mean((img_r - img_p) ** 2))
        assert rms < 1.0, (policy, rms)


def test_bf16_loss_feed_flags():
    """The bf16 loss-feed experiment flags (objective.BF16_TAPS taps in
    compute dtype; objective.STYLE_EINSUM reshape-free style contraction)
    track the unflagged bf16 path closely, and are exact no-ops for
    float32 parity mode. Process-level flags: they are read when the step
    core is built, so the test clears the build cache around each arm."""
    from style_transfer2_tpu.engine import objective
    from style_transfer2_tpu.engine.steps import build_step_core

    FLAG_NAMES = ('BF16_TAPS', 'STYLE_EINSUM', 'BF16_FEED')
    orig = {k: getattr(objective, k) for k in FLAG_NAMES}

    def run_with(precision, **flags):
        # Every arm pins BOTH flags explicitly (unset = False) so each arm
        # tests exactly the named delta regardless of shipped defaults, and
        # the originals are restored afterwards (STYLE_EINSUM ships True).
        for k in FLAG_NAMES:
            setattr(objective, k, flags.get(k, False))
        build_step_core.cache_clear()
        try:
            return _run(precision, 'lbfgs')
        finally:
            for k, v in orig.items():
                setattr(objective, k, v)
            build_step_core.cache_clear()

    img32, traces32 = run_with('float32')
    img16, traces16 = run_with('bfloat16')
    for flags in ({'BF16_TAPS': True}, {'STYLE_EINSUM': True},
                  {'BF16_TAPS': True, 'STYLE_EINSUM': True},
                  {'BF16_FEED': True}):
        # float32: parity mode is untouched, bit-exact.
        img, traces = run_with('float32', **flags)
        np.testing.assert_array_equal(img, img32, err_msg=str(flags))
        for t, t32 in zip(traces, traces32):
            for key in t32:
                if key in ('time', 'fevals'):
                    continue
                np.testing.assert_array_equal(t[key], t32[key],
                                              err_msg=str(flags))
        # bfloat16: stays in-family with the unflagged bf16 trajectory
        # (flag-induced deviations are of the same order as bf16 noise).
        img, traces = run_with('bfloat16', **flags)
        assert np.isfinite(img).all()
        for step, (t, t16) in enumerate(zip(traces, traces16)):
            rtol = 0.1 if step == 0 else 0.75
            np.testing.assert_allclose(t['loss'], t16['loss'], rtol=rtol,
                                       err_msg='%s@%d' % (flags, step))


def test_bf16_history_tracks_f32_history():
    """BF16_HISTORY stores the L-BFGS curvature pairs in bf16 (bf16 engine
    mode only): the trajectory tracks the f32-history bf16 run, the buffers
    actually store bf16, warm resamples preserve the dtype, and f32 parity
    mode keeps f32 buffers regardless of the flag."""
    import jax.numpy as jnp

    from style_transfer2_tpu.optim import lbfgs

    orig = lbfgs.BF16_HISTORY
    orig_gate = lbfgs.BF16_HISTORY_MIN_PIXELS
    # Test the mechanism at a toy grid: the production size gate keeps
    # f32 history below 160k px (256px bf16 diverged on hardware).
    lbfgs.BF16_HISTORY_MIN_PIXELS = 0

    def run(flag, precision):
        lbfgs.BF16_HISTORY = flag
        try:
            rng = np.random.RandomState(11)
            st = StyleTransfer(random_params(6), precision=precision)
            st.set_weights(WEIGHTS, SCALARS)
            st.set_optimizer('lbfgs')
            st.set_step_size(1.0)
            st.set_content(rng.randint(0, 256, (24, 24, 3)).astype(np.uint8))
            st.set_style(rng.randint(0, 256, (24, 24, 3)).astype(np.uint8))
            st.set_input(rng.randint(0, 256, (24, 24, 3)).astype(np.uint8))
            assert st.start()
            traces = [st.step()[1] for _ in range(4)]
            st.resample_input((16, 16))
            st.resample_content((16, 16))
            st.step()
            return st, traces
        finally:
            lbfgs.BF16_HISTORY = orig

    st32, base = run(False, 'bfloat16')
    assert st32.opt_state['sk'].dtype == jnp.float32
    st16, feed = run(True, 'bfloat16')
    assert st16.opt_state['sk'].dtype == jnp.bfloat16   # survives resample
    assert st16.opt_state['syk'].dtype == jnp.float32
    for step, (tf, tb) in enumerate(zip(feed, base)):
        rtol = 0.02 if step == 0 else 0.5
        np.testing.assert_allclose(tf['loss'], tb['loss'], rtol=rtol,
                                   err_msg='step %d' % step)
    # f32 parity mode ignores the flag entirely.
    stp, _ = run(True, 'float32')
    assert stp.opt_state['sk'].dtype == jnp.float32
    # The size gate: below BF16_HISTORY_MIN_PIXELS the history stays f32
    # even in bf16 mode (256px bf16 pairs diverged to NaN on hardware —
    # tools/diag_nan256.py).
    lbfgs.BF16_HISTORY_MIN_PIXELS = orig_gate
    stg, _ = run(True, 'bfloat16')
    assert stg.opt_state['sk'].dtype == jnp.float32
    assert lbfgs.history_dtype_for(jnp.bfloat16, (512, 512)) == jnp.bfloat16
    assert lbfgs.history_dtype_for(jnp.bfloat16, (256, 256)) is None

"""run_steps (fused lax.scan) must be step-for-step identical to repeated
single steps — same traces, same final iterate, same norm-cache behavior."""

import numpy as np

from style_transfer2_tpu.engine import StyleTransfer
from style_transfer2_tpu.models import random_params

WEIGHTS = {
    'content': {'conv2_2': 0.1},
    'style': {'conv1_1': 1.0, 'conv2_1': 1.0},
    'deepdream': {},
}
SCALARS = {'p': 50.0, 'p_power': 6.0, 'tv': 5.0, 'tv_power': 2.0}


def _make(rng, optimizer):
    params = random_params(11)
    content = rng.randint(0, 256, (24, 24, 3)).astype(np.uint8)
    style = rng.randint(0, 256, (24, 24, 3)).astype(np.uint8)
    inp = rng.randint(0, 256, (24, 24, 3)).astype(np.uint8)
    st = StyleTransfer(params)
    st.set_weights(WEIGHTS, SCALARS)
    st.set_optimizer(optimizer)
    st.set_step_size({'adam': 10.0, 'lbfgs': 1.0}[optimizer])
    st.set_content(content)
    st.set_style(style)
    st.set_input(inp)
    assert st.start()
    return st


def test_scan_matches_single_steps(rng):
    for optimizer in ('adam', 'lbfgs'):
        seed = np.random.RandomState(5)
        a = _make(seed, optimizer)
        seed = np.random.RandomState(5)
        b = _make(seed, optimizer)

        imgs_a = []
        for _ in range(4):
            img, _ = a.step()
            imgs_a.append(img)
        img_b, _ = b.run_steps(4)

        assert a.t == b.t == 4
        assert len(a.traces) == len(b.traces)
        for ta, tb in zip(a.traces, b.traces):
            for key in ta.data:
                if key in ('time',):
                    continue
                np.testing.assert_allclose(
                    ta.data[key], tb.data[key], rtol=1e-5, atol=1e-7,
                    err_msg='%s/%s' % (optimizer, key))
        np.testing.assert_allclose(imgs_a[-1], img_b, rtol=1e-5, atol=1e-4)


def test_prewarm_leaves_live_state_untouched(rng):
    """prewarm compiles another grid's programs on a throwaway engine: the
    live trajectory must be bit-identical to a run without prewarm, and a
    subsequent resize onto the prewarmed grid must step cleanly."""
    seed = np.random.RandomState(7)
    a = _make(seed, 'lbfgs')
    seed = np.random.RandomState(7)
    b = _make(seed, 'lbfgs')

    a.step()
    dt = a.prewarm((16, 16), ks=(1, 3))
    assert dt > 0
    a.step()
    for _ in range(2):
        b.step()

    assert a.t == 2 and a.input_hw == (24, 24)
    for ta, tb in zip(a.traces, b.traces):
        for key in ta.data:
            if key == 'time':
                continue
            np.testing.assert_array_equal(ta.data[key], tb.data[key], key)

    a.resample_input((16, 16))
    a.resample_content((16, 16))
    _, tr = a.step()
    assert np.isfinite(tr['loss'])


def test_s2d_resident_scan_tracks_plain(rng):
    """S2D_RESIDENT (bf16 fused scan with the iterate + optimizer state in
    s2d layout) must track the plain bf16 scan trajectory: the convs see
    identical values (the shuffle is an exact permutation), TV's s2d form
    is bit-identical, and the only deviations are reduction reassociation
    in the permutation-invariant sums. State converts back at chunk
    boundaries, so a following interactive step continues cleanly."""
    from style_transfer2_tpu.engine import steps as steps_mod

    def run(flag, optimizer):
        orig = steps_mod.S2D_RESIDENT
        steps_mod.S2D_RESIDENT = flag
        steps_mod.build_scan_fn.cache_clear()
        try:
            seed = np.random.RandomState(9)
            params = random_params(13)
            st = StyleTransfer(params, precision='bfloat16')
            st.set_weights(WEIGHTS, SCALARS)
            st.set_optimizer(optimizer)
            st.set_step_size({'adam': 10.0, 'lbfgs': 1.0}[optimizer])
            st.set_content(seed.randint(0, 256, (24, 24, 3)).astype(np.uint8))
            st.set_style(seed.randint(0, 256, (24, 24, 3)).astype(np.uint8))
            st.set_input(seed.randint(0, 256, (24, 24, 3)).astype(np.uint8))
            assert st.start()
            img, _ = st.run_steps(4)
            assert st.input_hw == (24, 24)      # state back in full-res
            _, tr = st.step()                   # interactive step continues
            assert np.isfinite(tr['loss'])
            return img, [t.data for t in st.traces]
        finally:
            steps_mod.S2D_RESIDENT = orig
            steps_mod.build_scan_fn.cache_clear()

    for optimizer in ('lbfgs', 'adam'):
        img_p, traces_p = run(False, optimizer)
        img_r, traces_r = run(True, optimizer)
        assert len(traces_p) == len(traces_r)
        for i, (tp, tr_) in enumerate(zip(traces_p, traces_r)):
            rtol = 0.02 if i == 0 else 0.2   # bf16 reassociation compounds
            for key in tp:
                if key in ('time', 'fevals'):
                    continue
                np.testing.assert_allclose(
                    tr_[key], tp[key], rtol=rtol,
                    err_msg='%s/%s@%d' % (optimizer, key, i))
        rms = np.sqrt(np.mean((img_r - img_p) ** 2))
        assert rms < 4.0, (optimizer, rms)


def test_pipelined_primed_traces_stay_in_dispatch_order(rng):
    """Round-4 self-review residual #1: with two primed dispatches in
    flight (the video-mode shape — every frame changes the objective, so
    every begin_steps primes inside the scan), each dispatch's prime
    trace must land immediately before ITS OWN step traces. The old
    module-global _pending_prime flushed the NEWER dispatch's prime at
    the OLDER dispatch's collect, misordering the trace CSV."""
    seed = np.random.RandomState(21)
    st = _make(seed, 'lbfgs')
    assert st._needs_init                      # fresh start: A primes
    a = st.begin_steps(2)
    st.set_weights(WEIGHTS, SCALARS)           # objective change: B primes
    assert st._needs_init
    b = st.begin_steps(2)                      # in flight behind A
    st.collect_steps(a, fetch_image=False)
    st.collect_steps(b, fetch_image=False)

    # Expected order: A.prime, A.step1, A.step2, B.prime, B.step1, B.step2.
    # Prime traces are eval traces — no 'fevals' key.
    fevals = [t.data.get('fevals') for t in st.traces]
    assert fevals == [None, 1, 2, None, 3, 4], fevals
    for t in st.traces:
        assert np.isfinite(t.data['loss'])

    # collect_steps_many must interleave identically.
    seed = np.random.RandomState(21)
    st2 = _make(seed, 'lbfgs')
    a2 = st2.begin_steps(2)
    st2.set_weights(WEIGHTS, SCALARS)
    b2 = st2.begin_steps(2)
    st2.collect_steps_many([a2, b2], fetch_image=False)
    fevals2 = [t.data.get('fevals') for t in st2.traces]
    assert fevals2 == [None, 1, 2, None, 3, 4], fevals2
    for ta, tb in zip(st.traces, st2.traces):
        np.testing.assert_allclose(ta.data['loss'], tb.data['loss'],
                                   rtol=1e-6)


def test_scan_then_step_continues(rng):
    st = _make(rng, 'adam')
    st.run_steps(2, fetch_image=False)
    img, trace = st.step()
    assert st.t == 3
    assert trace['fevals'] == 3
    assert np.isfinite(trace['loss'])
    snap = st.snapshot()
    np.testing.assert_allclose(snap, img, rtol=1e-6)

"""First-eval gradient-RMS norm CARRY: polish, respawn, and migration
paths must continue the session's normalized objective instead of
re-anchoring it at the live iterate (reference semantics: the norm cache
persists until reset — worker.py:137,172-175). Re-anchoring at a
partially-converged image inflates the per-layer weights (the gradients
there are small), so the tail/restart silently optimizes a different
objective and its reported losses are incommensurate with the main
run's — the round-4 part-15 hardware arms measured exactly that (a
"25x bf16 delta" that was normalization, not quality)."""

import numpy as np

from style_transfer2_tpu.engine import StyleTransfer
from style_transfer2_tpu.engine.batched import BatchedStyleTransfer
from style_transfer2_tpu.models import random_params

WEIGHTS = {'content': {'conv2_2': 0.1},
           'style': {'conv1_1': 1.0, 'conv2_1': 1.0}, 'deepdream': {}}
SCALARS = {'p': 50.0, 'p_power': 6.0, 'tv': 5.0, 'tv_power': 2.0}
HW = (24, 24)


def _engine(precision='float32'):
    """Engine over a FIXED image triple (every call sees the same job)."""
    rng = np.random.RandomState(7)
    st = StyleTransfer(random_params(11), precision=precision)
    st.set_weights(WEIGHTS, SCALARS)
    st.set_optimizer('lbfgs')
    st.set_step_size(1.0)
    st.set_content(rng.randint(0, 256, HW + (3,)).astype(np.uint8))
    st.set_style(rng.randint(0, 256, HW + (3,)).astype(np.uint8))
    st.set_input(rng.randint(0, 256, HW + (3,)).astype(np.uint8))
    assert st.start()
    return st


def _copy_norms(dst, src):
    """What cli.py's polish block does."""
    dst.norm_vals.update(
        {k: np.float32(v) for k, v in src.norm_vals.items()})
    dst.norm_set.update(
        {k: np.bool_(bool(v)) for k, v in src.norm_set.items()})


def test_polish_engine_inherits_normalized_objective():
    """The CLI --polish warm start: a fresh engine fed the main run's
    snapshot AND its norm state evaluates ~the main run's final loss as
    its prime trace row (same arithmetic here, so the only delta is the
    snapshot's uint8 quantization); without the carry it re-anchors and
    reads a number from a different objective."""
    st = _engine()
    trace = None
    for _ in range(8):
        _, trace = st.step()
    final_loss = trace['loss']
    snap = st.snapshot()

    carried = _engine()
    carried.set_input(snap)
    _copy_norms(carried, st)
    n0 = len(carried.traces)
    carried.run_steps(2, fetch_image=False)
    prime_loss = carried.traces[n0].data['loss']
    assert np.isclose(prime_loss, final_loss, rtol=0.05), \
        (prime_loss, final_loss)

    # Control: the same warm start WITHOUT the carry re-anchors its norms
    # at the (partially converged) snapshot and reports a materially
    # different number — the incommensurability the carry exists to fix.
    fresh = _engine()
    fresh.set_input(snap)
    n0 = len(fresh.traces)
    fresh.run_steps(2, fetch_image=False)
    reanchored_loss = fresh.traces[n0].data['loss']
    assert not np.isclose(reanchored_loss, final_loss, rtol=0.25), \
        (reanchored_loss, final_loss)


def test_batched_migration_carries_norms():
    """lane_norms -> add_job(norms=...) round-trips the per-lane norm
    state across buckets (the pooled ladder climb / polish migration)."""
    params = random_params(11)
    rng = np.random.RandomState(3)
    job = {k: rng.randint(0, 256, HW + (3,)).astype(np.uint8)
           for k in ('content', 'style', 'input')}
    bt1 = BatchedStyleTransfer(params, WEIGHTS, SCALARS, HW, max_lanes=2)
    lane = bt1.add_job(job['content'], job['style'], job['input'])
    bt1.run_steps_all(3)
    keys, vals, set_ = bt1.norms_host()
    assert set_[:, lane].all()   # every norm anchored after the first eval

    norms = bt1.lane_norms(lane)
    hw2 = (32, 32)
    job2 = {k: rng.randint(0, 256, hw2 + (3,)).astype(np.uint8)
            for k in ('content', 'style', 'input')}
    bt2 = BatchedStyleTransfer(params, WEIGHTS, SCALARS, hw2, max_lanes=2)
    lane2 = bt2.add_job(job2['content'], job2['style'], job2['input'],
                        norms=norms)
    keys2, vals2, set2 = bt2.norms_host()
    assert keys2 == keys
    assert set2[:, lane2].all()
    np.testing.assert_allclose(vals2[:, lane2], vals[:, lane], rtol=0)

    # Host-float norms (a persistence restore) seed identically.
    host_norms = ({k: float(vals[i, lane]) for i, k in enumerate(keys)},
                  {k: bool(set_[i, lane]) for i, k in enumerate(keys)})
    lane3 = bt2.add_job(job2['content'], job2['style'], job2['input'],
                        norms=host_norms)
    _, vals3, set3 = bt2.norms_host()
    assert set3[:, lane3].all()
    np.testing.assert_allclose(vals3[:, lane3], vals[:, lane], rtol=0)

    # A plain add_job still anchors fresh (resets must re-anchor).
    bt1.remove_job(lane)
    lane4 = bt1.add_job(job['content'], job['style'], job['input'])
    _, _, set4 = bt1.norms_host()
    assert not set4[:, lane4].any()


def test_persist_roundtrips_norms(tmp_path):
    """A restored session keeps the norm state it was persisted with."""
    from style_transfer2_tpu.serve import persist
    from style_transfer2_tpu.serve.session import Session

    sess = Session()
    sess.params = {'size': 24}
    sess.input_arr = np.zeros(HW + (3,), np.float32)
    sess.norms = ({'conv1_1_s': 2.5, 'tv': 0.125},
                  {'conv1_1_s': True, 'tv': True})
    path = tmp_path / 'sess.npz'
    persist.save_session(path, sess)

    restored = Session()
    assert persist.load_session(path, restored)
    assert restored.norms == sess.norms

    # And a norm-less snapshot restores to None (schema tolerance).
    sess.norms = None
    persist.save_session(path, sess)
    restored = Session()
    assert persist.load_session(path, restored)
    assert restored.norms is None

"""Optimizer tests: the Adam variant and fixed-step L-BFGS against the
independent oracle on a synthetic quadratic objective (SURVEY.md §4.2)."""

import jax.numpy as jnp
import numpy as np

import oracle
from style_transfer2_tpu.optim import adam, lbfgs


def _quadratic(a_diag, b):
    """f(x) = 0.5 * sum(a * (x - b)^2) with analytic gradient; shapes NHWC."""
    a = np.float32(a_diag)
    b = np.float32(b)

    def np_opfunc(x):
        loss = 0.5 * np.sum(a * (x - b) ** 2)
        grad = a * (x - b)
        return np.float32(loss), np.float32(grad)

    def jnp_opfunc(x):
        loss = 0.5 * jnp.sum(a * (x - b) ** 2)
        grad = a * (x - b)
        return loss, grad, None

    return np_opfunc, jnp_opfunc


def _problem(rng, shape=(1, 4, 6, 3)):
    a = rng.uniform(0.5, 3.0, shape)
    b = rng.randn(*shape)
    x0 = rng.randn(*shape).astype(np.float32)
    return a, b, x0


def test_adam_matches_oracle(rng):
    a, b, x0 = _problem(rng)
    np_f, jnp_f = _quadratic(a, b)

    ours = adam.init(x0)
    ref = oracle.OracleAdam(x0.copy(), np_f, step_size=0.5)
    for _ in range(6):
        ours, _, _ = adam.step(ours, jnp_f, 0.5)
        ref.step()
    np.testing.assert_allclose(np.asarray(ours['x']), ref.x,
                               rtol=1e-4, atol=1e-5)
    assert int(ours['t']) == ref.t == 6


def test_adam_objective_changed_keeps_g2(rng):
    a, b, x0 = _problem(rng)
    np_f, jnp_f = _quadratic(a, b)

    ours = adam.init(x0)
    ref = oracle.OracleAdam(x0.copy(), np_f, step_size=0.5)
    for _ in range(3):
        ours, _, _ = adam.step(ours, jnp_f, 0.5)
        ref.step()
    ours = adam.objective_changed(ours)
    ref.objective_changed()
    assert int(ours['g1_items']) == 0
    assert int(ours['g2_items']) == 3  # second moment counter survives
    for _ in range(3):
        ours, _, _ = adam.step(ours, jnp_f, 0.5)
        ref.step()
    np.testing.assert_allclose(np.asarray(ours['x']), ref.x,
                               rtol=1e-4, atol=1e-5)


def test_adam_resample_moments(rng):
    a, b, x0 = _problem(rng, (1, 8, 8, 3))
    _, jnp_f = _quadratic(a, b)
    state = adam.init(x0)
    for _ in range(2):
        state, _, _ = adam.step(state, jnp_f, 0.5)
    resized = adam.resample(state, (4, 4))
    assert resized['x'].shape == (1, 4, 4, 3)
    assert resized['g1_mean'].shape == (1, 4, 4, 3)
    assert float(jnp.min(resized['g2_mean'])) >= 0.0  # clamped
    assert int(resized['g2_items']) == int(state['g2_items'])


def test_lbfgs_matches_oracle(rng):
    a, b, x0 = _problem(rng)
    np_f, jnp_f = _quadratic(a, b)

    state = lbfgs.init(x0, n_corr=5)
    ref = oracle.OracleLBFGS(x0.copy(), np_f, step_size=0.3, n_corr=5)

    state, _, _ = lbfgs.initial_eval(state, jnp_f)
    losses = []
    for _ in range(12):  # > n_corr: exercises the ring buffer
        state, loss, _ = lbfgs.step(state, jnp_f, 0.3)
        losses.append(float(loss))
        ref.step()
    np.testing.assert_allclose(np.asarray(state['x']), ref.x,
                               rtol=1e-3, atol=1e-4)
    assert int(state['count']) == min(12, 5) == len(ref.sk)
    # converging on a quadratic
    assert losses[-1] < losses[0] * 0.1


def test_lbfgs_first_step_rms_scaled(rng):
    # With no history the direction is RMS-normalized (optimizers.py:100-102).
    a, b, x0 = _problem(rng)
    np_f, jnp_f = _quadratic(a, b)
    state = lbfgs.init(x0)
    state, _, _ = lbfgs.initial_eval(state, jnp_f)
    grad0 = np.asarray(state['grad'])
    d = np.asarray(lbfgs.inv_hv(state, state['grad']))
    expected = grad0 / np.sqrt(np.mean(grad0 ** 2))
    np.testing.assert_allclose(d, expected, rtol=1e-5)


def test_lbfgs_rejects_flat_curvature(rng):
    # A pair with s.y <= 1e-10 must be rejected (optimizers.py:82-83).
    x0 = np.zeros((1, 2, 2, 1), np.float32)
    state = lbfgs.init(x0, n_corr=3)
    s = jnp.zeros_like(state['x'])
    y = jnp.zeros_like(state['x'])
    sk, yk, syk, count, pos = lbfgs.store_curvature_pair(state, s, y)
    assert int(count) == 0 and int(pos) == 0

    s = jnp.ones_like(state['x'])
    y = jnp.ones_like(state['x'])
    sk, yk, syk, count, pos = lbfgs.store_curvature_pair(state, s, y)
    assert int(count) == 1 and int(pos) == 1
    np.testing.assert_allclose(np.asarray(sk[0]), 1.0)
    np.testing.assert_allclose(float(syk[0]), 4.0)


def test_lbfgs_objective_changed_clears(rng):
    a, b, x0 = _problem(rng)
    np_f, jnp_f = _quadratic(a, b)
    state = lbfgs.init(x0)
    state, _, _ = lbfgs.initial_eval(state, jnp_f)
    for _ in range(3):
        state, _, _ = lbfgs.step(state, jnp_f, 0.3)
    x_before = np.asarray(state['x'])
    state = lbfgs.objective_changed(state)
    assert int(state['count']) == 0
    np.testing.assert_allclose(np.asarray(state['x']), x_before)


def test_bf16_history_rejects_rounding_flipped_curvature():
    """Low-precision history computes sy from the pair AS STORED: a pair
    whose full-precision s.y clears the absolute guard but whose bf16
    rounding zeroes (or flips) the stored curvature must be REJECTED —
    the sign-inconsistent rho diverged to NaN on hardware within 9
    iterations (tools/diag_nan256.py, hw_round5 nan_diag). float32
    history keeps the reference's absolute-only guard exactly."""
    x = jnp.zeros((2,), jnp.float32)
    s = jnp.float32([1.0, 1.0])
    y = jnp.float32([1.0 + 2.0 ** -9, -1.0])  # f32 s.y = 2^-9 > SY_MIN
    assert float(jnp.vdot(s, y)) > lbfgs.SY_MIN
    # bf16 rounds 1 + 2^-9 down to 1.0: the stored pair's curvature is 0.
    state = lbfgs.init(x, n_corr=2, history_dtype=jnp.bfloat16)
    _, _, _, count, pos = lbfgs.store_curvature_pair(state, s, y)
    assert int(count) == 0 and int(pos) == 0
    state32 = lbfgs.init(x, n_corr=2)
    _, _, _, count32, _ = lbfgs.store_curvature_pair(state32, s, y)
    assert int(count32) == 1

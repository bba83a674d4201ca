"""Guards the driver entry points (__graft_entry__.py): the end-of-round
driver compile-checks entry() single-chip and executes dryrun_multichip(n)
on a virtual CPU mesh — a regression here silently voids the round's
multichip evidence, so the suite runs both the same way the driver does."""

import jax
import jax.numpy as jnp
import numpy as np


def test_entry_compiles_and_steps():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    jitted = jax.jit(fn)
    # Compile check (what the driver does), then execute and sanity-check.
    jitted.lower(*args).compile()
    x, loss = jitted(*args)
    params, state, inputs, step_size = args
    assert x.shape == state['x'].shape
    assert np.isfinite(float(loss))
    # Determinism at fixed inputs (pure fn).
    x2, loss2 = jitted(*args)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(x2))


def test_dryrun_multichip_8_devices():
    import __graft_entry__ as ge

    # conftest pins an 8-device CPU backend; dryrun's own pin is a no-op
    # then. Runs both phases: dp x sp lanes + fully-spatial block-remat.
    ge.dryrun_multichip(8)

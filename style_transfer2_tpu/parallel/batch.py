"""Batched serving: concurrent user jobs as vmapped batch lanes.

The reference serves N concurrent users with N (app + worker) OS-process
pairs behind a cookie-affine router (router.py:73-83) — whole-job
granularity. The TPU-native equivalent runs jobs of the same resolution
bucket as lanes of ONE batched step: jax.vmap folds the per-lane VGG
forward/backward into batched convs on the MXU, and the lane axis shards
over the mesh 'data' axis, so a v5e-4 slice serves 4+ jobs at full
utilization with one dispatch.

Per-lane independence is exact: every lane has its own iterate, optimizer
state, content features, style Grams, loss weights, step size, and first-eval
norm state — vmap(step_core) is semantically identical to running
step_core per lane (tested in tests/test_parallel.py).

Lanes in one batch share the objective STRUCTURE (ObjectiveSpec); weight
VALUES vary per lane. A serving tier buckets jobs by (resolution, spec) —
see serve/driver.py.
"""

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..engine.steps import build_step_core
from ..optim import adam as _adam


@functools.lru_cache(maxsize=64)
def build_batched_step_fns(spec, optimizer, precision='float32',
                           b1=_adam.B1_DEFAULT, b2=_adam.B2_DEFAULT,
                           remat=False):
    """Returns (batched_step, batched_eval): the fused step vmapped over a
    leading lane axis on (state, inputs, step_size); params are broadcast.

      batched_step(params, states, inputs, step_sizes)
        -> (states', norms', traces)   # every output has a leading lane axis
    """
    step_core, eval_core = build_step_core(spec, optimizer, precision, b1, b2,
                                           remat=remat)
    batched_step = jax.jit(jax.vmap(step_core, in_axes=(None, 0, 0, 0)),
                           donate_argnums=(1,))
    batched_eval = None
    if eval_core is not None:
        batched_eval = jax.jit(jax.vmap(eval_core, in_axes=(None, 0, 0)),
                               donate_argnums=(1,))
    return batched_step, batched_eval


@functools.lru_cache(maxsize=64)
def build_masked_batched_step_fns(spec, optimizer, precision='float32',
                                  b1=_adam.B1_DEFAULT, b2=_adam.B2_DEFAULT):
    """Like build_batched_step_fns, with a per-lane run mask: lanes whose
    mask is False still compute (the batch is one program) but their
    optimizer state and norm cache are left untouched — how the pooled
    serving tier pauses individual sessions without losing momentum.

      masked_step(params, states, inputs, step_sizes, mask)
        -> (states', norms', traces)
    """
    step_core, eval_core = build_step_core(spec, optimizer, precision, b1, b2)

    def masked_core(params, state, inputs, step_size, run):
        state_new, (nv, ns), trace = step_core(params, state, inputs,
                                               step_size)
        keep = lambda new, old: jax.tree_util.tree_map(
            lambda n, o: jnp.where(run, n, o), new, old)
        state_out = keep(state_new, state)
        norms_out = (keep(nv, inputs['norms_vals']),
                     keep(ns, inputs['norms_set']))
        return state_out, norms_out, trace

    masked_step = jax.jit(
        jax.vmap(masked_core, in_axes=(None, 0, 0, 0, 0)),
        donate_argnums=(1,))

    masked_eval = None
    if eval_core is not None:
        def masked_eval_core(params, state, inputs, run):
            state_new, (nv, ns), trace = eval_core(params, state, inputs)
            keep = lambda new, old: jax.tree_util.tree_map(
                lambda n, o: jnp.where(run, n, o), new, old)
            return (keep(state_new, state),
                    (keep(nv, inputs['norms_vals']),
                     keep(ns, inputs['norms_set'])), trace)
        masked_eval = jax.jit(
            jax.vmap(masked_eval_core, in_axes=(None, 0, 0, 0)),
            donate_argnums=(1,))
    return masked_step, masked_eval


@functools.lru_cache(maxsize=64)
def build_masked_batched_scan_fn(spec, optimizer, precision='float32',
                                 n_steps=10, b1=_adam.B1_DEFAULT,
                                 b2=_adam.B2_DEFAULT):
    """K fused steps for every lane in ONE dispatch: vmap over lanes of a
    lax.scan of the masked step. Per-lane norm state threads through the
    scan; masked lanes stay frozen for all K steps.

      scan_fn(params, states, inputs, step_sizes, mask)
        -> (states', norms', traces)   # traces: tuple of (lanes, K) arrays
    """
    step_core, _ = build_step_core(spec, optimizer, precision, b1, b2)

    def lane_scan(params, state, inputs, step_size, run):
        keep = lambda new, old: jax.tree_util.tree_map(
            lambda n, o: jnp.where(run, n, o), new, old)

        def body(carry, _):
            state, nv, ns = carry
            step_inputs = dict(inputs)
            step_inputs['norms_vals'] = nv
            step_inputs['norms_set'] = ns
            state_new, (nv2, ns2), trace = step_core(params, state,
                                                     step_inputs, step_size)
            return (keep(state_new, state), keep(nv2, nv), keep(ns2, ns)), \
                trace

        init = (state, inputs['norms_vals'], inputs['norms_set'])
        (state, nv, ns), traces = jax.lax.scan(body, init, None,
                                               length=n_steps)
        return state, (nv, ns), traces

    return jax.jit(jax.vmap(lane_scan, in_axes=(None, 0, 0, 0, 0)),
                   donate_argnums=(1,))


def stack_lanes(trees):
    """Stacks a list of per-lane pytrees along a new leading lane axis."""
    return jax.tree_util.tree_map(lambda *leaves: jnp.stack(leaves), *trees)


def unstack_lane(tree, i):
    """Extracts lane i from a stacked pytree."""
    return jax.tree_util.tree_map(lambda leaf: leaf[i], tree)


class DataPlacement:
    """Shards the leading lane axis of stacked pytrees over the mesh 'data'
    axis (scalar leaves replicate)."""

    def __init__(self, mesh, axis='data'):
        if axis not in mesh.axis_names:
            axis = mesh.axis_names[0]
        self.mesh = mesh
        self.axis = axis

    def place(self, tree):
        def put(leaf):
            ndim = getattr(leaf, 'ndim', 0)
            if ndim == 0:
                spec = P()
            else:
                spec = P(self.axis, *([None] * (ndim - 1)))
            return jax.device_put(leaf, NamedSharding(self.mesh, spec))
        return jax.tree_util.tree_map(put, tree)

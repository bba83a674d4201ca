"""Builders for the fused jitted optimization steps.

One call = one optimizer iteration = one XLA program: VGG forward, all
losses, the vjp backward, and the optimizer update never leave the device.
The reference runs this loop as Python/NumPy around Caffe with a process
boundary per iterate (worker.py:338-364); here the only host traffic is the
returned trace scalars and whatever snapshot the caller fetches.

Step functions are cached per (spec, optimizer, precision, ...) — jax.jit
adds its own per-shape cache underneath, so resolution changes compile once
per size bucket and are then free.
"""

import functools

import jax
import jax.numpy as jnp

from ..optim import adam, lbfgs
from .objective import make_objective

_PRECISIONS = {
    'float32': (jax.lax.Precision.HIGHEST, jnp.float32),
    'bfloat16': (jax.lax.Precision.DEFAULT, jnp.bfloat16),
}


def precision_config(name):
    """Maps a config-level precision name to (lax precision, compute dtype)."""
    return _PRECISIONS[name]


@functools.lru_cache(maxsize=64)
def build_step_fns(spec, optimizer, precision='float32',
                   b1=adam.B1_DEFAULT, b2=adam.B2_DEFAULT):
    """Returns (step_fn, eval_fn). step_fn performs one optimizer iteration;
    eval_fn primes L-BFGS's (loss, grad) cache (None for Adam).

    Signatures (all pytree args):
      step_fn(params, state, inputs, step_size) -> (state', norms', trace)
      eval_fn(params, state, inputs) -> (state', norms', trace)
    where inputs = dict(content_feats=..., grams=..., layer_weights=...,
    scalars=..., norms_vals=..., norms_set=...).
    """
    lax_precision, compute_dtype = precision_config(precision)
    objective = make_objective(spec, lax_precision, compute_dtype)

    def make_opfunc(params, inputs):
        def opfunc(x):
            loss, grad, norms, trace = objective(
                params, x,
                inputs['content_feats'], inputs['grams'],
                inputs['layer_weights'], inputs['scalars'],
                inputs['norms_vals'], inputs['norms_set'])
            return loss, grad, (norms, trace)
        return opfunc

    if optimizer == 'adam':
        @functools.partial(jax.jit, donate_argnums=(1,))
        def step_fn(params, state, inputs, step_size):
            opfunc = make_opfunc(params, inputs)
            state_new, _, (norms, trace) = adam.step(
                state, opfunc, step_size, b1, b2)
            return state_new, norms, trace

        return step_fn, None

    if optimizer == 'lbfgs':
        @functools.partial(jax.jit, donate_argnums=(1,))
        def step_fn(params, state, inputs, step_size):
            opfunc = make_opfunc(params, inputs)
            state_new, _, (norms, trace) = lbfgs.step(state, opfunc, step_size)
            return state_new, norms, trace

        @functools.partial(jax.jit, donate_argnums=(1,))
        def eval_fn(params, state, inputs):
            opfunc = make_opfunc(params, inputs)
            state_new, _, (norms, trace) = lbfgs.initial_eval(state, opfunc)
            return state_new, norms, trace

        return step_fn, eval_fn

    raise ValueError('Unknown optimizer: %r' % (optimizer,))

"""Builders for the fused jitted optimization steps.

One call = one optimizer iteration = one XLA program: VGG forward, all
losses, the vjp backward, and the optimizer update never leave the device.
The reference runs this loop as Python/NumPy around Caffe with a process
boundary per iterate (worker.py:338-364); here the only host traffic is the
returned trace scalars and whatever snapshot the caller fetches.

Three composition levels:
  * build_step_core / build_eval_core — pure functions, used by the batched
    (vmap) and sharded paths in parallel/;
  * build_step_fns — the jitted single-step pair for interactive serving
    (control latency = 1 iteration, the reference guarantee);
  * build_scan_fn — K steps fused into one lax.scan dispatch for benchmark /
    batch workloads (zero host round-trips per iteration, the BASELINE.json
    north star). Weights are fixed for the duration of one scan.

Step functions are cached per (spec, optimizer, precision, ...) — jax.jit
adds its own per-shape cache underneath, so resolution changes compile once
per size bucket and are then free.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..optim import adam, lbfgs
from .objective import make_objective

# S2D_RESIDENT: keep the optimization iterate (and the whole image-shaped
# optimizer state) in the block-1 space-to-depth layout ACROSS a fused scan
# chunk — the per-step input shuffle and its backward (priced at ~6 ms/step
# at 2048px bf16 in 'slice' form, round-3 traces) are paid once per chunk
# boundary instead of once per step. Applies only to the fused scan path
# (build_scan_fn) in bf16 mode with the BLOCK1_S2D path active; the
# interactive single-step path is unchanged (chunk length 1 gains nothing).
# All optimizer math (L-BFGS two-loop vdots, Adam moments) and the p/
# temporal losses are pixel-permutation-invariant; TV runs its s2d-domain
# form (bit-identical, tests/test_ops.py). Hardware verdict (v5e bf16,
# on-device scan spans, fresh-process arms, tools/hw_round4_results.jsonl):
# the win is GATED — the per-chunk boundary conversion of the 22
# image-sized state leaves amortizes only over long chunks, and the
# in-scan shuffle it removes only matters at large grids. On the final
# round-4 defaults (BF16_FEED + BF16_HISTORY): 1024px chunk-60 19.212 vs
# 19.788 ms/step (-2.9%), 2048px chunk-60 88.149 vs 89.721 (-1.75%); but
# 512px chunk-60 4.057 vs 4.039 (noise-negative) and 2048px chunk-20
# LOST 0.9% in the feed-only arms. Default 'auto' = resident only for
# grids >= ~500k pixels AND chunks >= 40 steps — exactly the measured-win
# region; True forces it everywhere legal, False disables.
S2D_RESIDENT = 'auto'
S2D_RESIDENT_MIN_PIXELS = 500_000
S2D_RESIDENT_MIN_STEPS = 40

_PRECISIONS = {
    # Parity mode: HIGHEST runs f32 matmuls/convs via multi-pass bf16
    # emulation on the MXU — reference-exact math, golden-tested.
    'float32': (jax.lax.Precision.HIGHEST, jnp.float32),
    # Fast-f32 mode: f32 state, activations and HBM traffic, but matmul/conv
    # inputs rounded to bf16 for single-pass MXU (XLA's DEFAULT for f32 on
    # TPU). Golden tests exempt — a speed/quality point between parity f32
    # and bf16 (VERDICT r3 next-round #8).
    'float32_fast': (jax.lax.Precision.DEFAULT, jnp.float32),
    'bfloat16': (jax.lax.Precision.DEFAULT, jnp.bfloat16),
}


def precision_config(name):
    """Maps a config-level precision name to (lax precision, compute dtype)."""
    return _PRECISIONS[name]


@functools.lru_cache(maxsize=64)
def build_step_core(spec, optimizer, precision='float32',
                    b1=adam.B1_DEFAULT, b2=adam.B2_DEFAULT,
                    use_pallas=False, remat=False, block1_s2d=True,
                    input_s2d=False):
    """Returns (step_core, eval_core) — pure, un-jitted.

    Signatures (all pytree args):
      step_core(params, state, inputs, step_size) -> (state', norms', trace)
      eval_core(params, state, inputs) -> (state', norms', trace)
    where inputs = dict(content_feats=..., grams=..., layer_weights=...,
    scalars=..., norms_vals=..., norms_set=...). eval_core is None for Adam.
    input_s2d: the state's image-shaped leaves are in s2d layout
    (S2D_RESIDENT; the scan builder converts at chunk boundaries).
    """
    lax_precision, compute_dtype = precision_config(precision)
    objective = make_objective(spec, lax_precision, compute_dtype,
                               use_pallas, remat, block1_s2d, input_s2d)

    def make_opfunc(params, inputs):
        def opfunc(x):
            loss, grad, norms, trace = objective(
                params, x,
                inputs['content_feats'], inputs['grams'],
                inputs['layer_weights'], inputs['scalars'],
                inputs['norms_vals'], inputs['norms_set'],
                inputs.get('temporal_target'))
            return loss, grad, (norms, trace)
        return opfunc

    if optimizer == 'adam':
        def step_core(params, state, inputs, step_size):
            opfunc = make_opfunc(params, inputs)
            state_new, _, (norms, trace) = adam.step(
                state, opfunc, step_size, b1, b2)
            return state_new, norms, trace

        return step_core, None

    if optimizer == 'lbfgs':
        def step_core(params, state, inputs, step_size):
            opfunc = make_opfunc(params, inputs)
            state_new, _, (norms, trace) = lbfgs.step(state, opfunc, step_size)
            return state_new, norms, trace

        def eval_core(params, state, inputs):
            opfunc = make_opfunc(params, inputs)
            state_new, _, (norms, trace) = lbfgs.initial_eval(state, opfunc)
            return state_new, norms, trace

        return step_core, eval_core

    raise ValueError('Unknown optimizer: %r' % (optimizer,))


@functools.lru_cache(maxsize=64)
def build_step_fns(spec, optimizer, precision='float32',
                   b1=adam.B1_DEFAULT, b2=adam.B2_DEFAULT,
                   use_pallas=False, remat=False, block1_s2d=True):
    """The jitted (step_fn, eval_fn) pair for interactive single-stepping.
    The optimizer state is donated — its buffers are reused in place."""
    step_core, eval_core = build_step_core(spec, optimizer, precision, b1,
                                           b2, use_pallas, remat, block1_s2d)
    step_fn = jax.jit(step_core, donate_argnums=(1,))
    eval_fn = None if eval_core is None else jax.jit(eval_core,
                                                     donate_argnums=(1,))
    return step_fn, eval_fn


def _s2d_state(tree, hw):
    """Converts every image-shaped leaf ((..., H, W, 3) with (H, W) = hw)
    of an optimizer-state/inputs pytree to the block-1 s2d layout
    (..., H/2, W/2, 12). Leaves with other shapes pass through."""
    from ..models import vgg19
    h, w = hw

    def conv(leaf):
        if getattr(leaf, 'ndim', 0) >= 4 and leaf.shape[-3:] == (h, w, 3):
            lead = leaf.shape[:-3]
            flat = leaf.reshape((int(np.prod(lead)),) + (h, w, 3))
            out = vgg19._space_to_depth(flat)
            return out.reshape(lead + out.shape[1:])
        return leaf

    return jax.tree_util.tree_map(conv, tree)


def _d2s_state(tree, hw):
    """Inverse of _s2d_state."""
    from ..models import vgg19
    h, w = hw
    s2d_shape = (h // 2, w // 2, 12)

    def conv(leaf):
        if getattr(leaf, 'ndim', 0) >= 4 and leaf.shape[-3:] == s2d_shape:
            lead = leaf.shape[:-3]
            flat = leaf.reshape((int(np.prod(lead)),) + s2d_shape)
            out = vgg19._depth_to_space(flat, 3)
            return out.reshape(lead + out.shape[1:])
        return leaf

    return jax.tree_util.tree_map(conv, tree)


@functools.lru_cache(maxsize=64)
def build_scan_fn(spec, optimizer, precision='float32', n_steps=10,
                  b1=adam.B1_DEFAULT, b2=adam.B2_DEFAULT,
                  use_pallas=False, remat=False, block1_s2d=True,
                  primed=False):
    """K optimizer steps fused into one dispatch via lax.scan.

    scan_fn(params, state, inputs, step_size)
        -> (state', norms', traces, image)
    where traces is a tuple of (n_steps,) arrays (one per trace key) and
    image is the deprocessed (H, W, 3) float32 final iterate. The image is
    a SEPARATE output (not an alias of state'['x']) because state' is
    donated into the next dispatch under pipelining — the snapshot must
    survive that donation. The norm state threads through the scan, so
    first-eval caching behaves identically to K separate steps.

    Under S2D_RESIDENT (bf16 + BLOCK1_S2D path, even grid, no data tap,
    no Pallas) the whole image-shaped state converts to s2d layout ONCE on
    entry, every scanned step runs s2d-resident, and the state converts
    back on exit — persistent engine state stays full-res, so interactive
    steps, checkpoints and resamples are untouched. The flag is read at
    trace time (fresh process per hardware arm, like the other perf flags).

    primed=True (L-BFGS only) additionally runs the initial (loss, grad)
    evaluation INSIDE the same program before the scan, returning its
    trace as a fifth output — one dispatch instead of two when the
    (loss, grad) cache is stale (every video frame; every serving
    dispatch right after a control change):
      scan_fn(...) -> (state', norms', traces, image, prime_trace)
    """
    step_core, eval_core = build_step_core(spec, optimizer, precision, b1,
                                           b2, use_pallas, remat, block1_s2d)
    step_core_s2d, eval_core_s2d = build_step_core(
        spec, optimizer, precision, b1, b2, use_pallas, remat, block1_s2d,
        input_s2d=True)
    if primed and eval_core is None:
        raise ValueError('primed scan requires an optimizer with an '
                         'initial evaluation (lbfgs)')
    _, compute_dtype = precision_config(precision)

    def scan_fn(params, state, inputs, step_size):
        from ..models import vgg19
        hw = tuple(state['x'].shape[1:3])
        auto_ok = (S2D_RESIDENT != 'auto'
                   or (hw[0] * hw[1] >= S2D_RESIDENT_MIN_PIXELS
                       and n_steps >= S2D_RESIDENT_MIN_STEPS))
        resident = (
            S2D_RESIDENT and auto_ok and compute_dtype == jnp.bfloat16
            and bool(vgg19.BLOCK1_S2D) and block1_s2d and not use_pallas
            and hw[0] % 2 == 0 and hw[1] % 2 == 0
            and 'data' not in spec.layers and spec.layers)
        core = step_core_s2d if resident else step_core
        ecore = eval_core_s2d if resident else eval_core
        if resident:
            state = _s2d_state(state, hw)
            if inputs.get('temporal_target') is not None:
                inputs = dict(inputs)
                inputs['temporal_target'] = _s2d_state(
                    inputs['temporal_target'], hw)

        norms_vals = inputs['norms_vals']
        norms_set = inputs['norms_set']
        prime_trace = None
        if primed:
            state, (norms_vals, norms_set), prime_trace = ecore(
                params, state, inputs)

        def body(carry, _):
            state, norms_vals, norms_set = carry
            step_inputs = dict(inputs)
            step_inputs['norms_vals'] = norms_vals
            step_inputs['norms_set'] = norms_set
            state_new, norms, trace = core(params, state, step_inputs,
                                           step_size)
            return (state_new, norms[0], norms[1]), trace

        init = (state, norms_vals, norms_set)
        (state, norms_vals, norms_set), traces = jax.lax.scan(
            body, init, None, length=n_steps)
        if resident:
            state = _d2s_state(state, hw)
        image = vgg19.deprocess(state['x'])
        if primed:
            return state, (norms_vals, norms_set), traces, image, prime_trace
        return state, (norms_vals, norms_set), traces, image

    return jax.jit(scan_fn, donate_argnums=(1,))

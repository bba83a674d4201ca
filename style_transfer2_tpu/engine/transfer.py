"""The StyleTransfer state machine — host orchestration over device state.

Mirrors the reference's StyleTransfer class (worker.py:117-315): the same
image-slot lifecycle (input/content/style), start gating, reset semantics,
warm-started resolution changes, and per-step traces — but all arrays are
device pytrees, the step is one fused XLA program (engine/steps.py), and the
first-eval norm cache is explicit state threaded through the jit.

State layering ("state above, compute below", like the reference's app/worker
split): everything here is reconstructible from the host-side session, so a
device error costs only optimizer momentum — see reset()/checkpoint().
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..models import vgg19
from ..ops.gram import gram_matrix
from ..ops.resample import resize_nhwc
from ..optim import OPTIMIZERS, STEP_SIZES
from ..utils.tracing import Trace
from .objective import (
    LOSS_NAMES,
    SCALAR_LOSS_NAMES,
    ObjectiveSpec,
    empty_norms,
    scalars_to_arrays,
    weights_to_arrays,
)
from .steps import build_scan_fn, build_step_fns, precision_config


class StepsDispatch:
    """Handle for an in-flight begin_steps dispatch: the un-materialized
    trace arrays plus enough bookkeeping to label them on collection.

    prime carries the in-scan initial-eval trace of a primed dispatch as
    (spec, trace futures). It rides the handle — not engine-global state —
    so with several dispatches in flight (pipelined video) each prime
    trace lands at ITS OWN dispatch's collect, immediately before that
    dispatch's step traces, and the trace CSV stays in dispatch order."""

    __slots__ = ('spec', 'traces', 'n_steps', 't_end', 'image', 'prime')

    def __init__(self, spec, traces, n_steps, t_end, image, prime=None):
        self.spec = spec
        self.traces = traces
        self.n_steps = n_steps
        self.t_end = t_end
        self.image = image  # deprocessed final iterate (device array)
        self.prime = prime  # (spec, trace futures) of the in-scan eval


class StyleTransfer:
    """Performs image stylization by minimizing the fused objective with an
    optimizer pytree. API parity with reference worker.py:117-315."""

    def __init__(self, params, precision='float32', n_corr=10, placement=None,
                 use_pallas=False, remat=False, block1_s2d=None):
        """placement: optional parallel.SpatialPlacement — shards the image
        axis of every array over a device mesh for high-res jobs; the same
        jitted step then runs SPMD with XLA-inserted halo exchanges.
        use_pallas: route the style branch through the fused Pallas kernel
        (TPU only; incompatible with spatial placement). remat:
        rematerialization policy — False, True/'conv' (checkpoint each
        conv; ~2x less residual memory, for 2K+ single-chip sizes) or
        'block' (checkpoint whole conv blocks; only pool boundaries + taps
        survive the forward, several-fold less memory again for the same
        recompute FLOPs — the 3K+/4K regime).
        block1_s2d: None (auto) enables the block-1 space-to-depth path
        except under spatial sharding; True/False force it (the hardware
        A/B knob for the sharded regime)."""
        self.params = params
        self.precision = precision
        self.n_corr = n_corr
        self.placement = placement
        self.use_pallas = use_pallas and placement is None
        self.remat = remat
        # Block-1 space-to-depth stays off under spatial sharding (auto):
        # the 6-D shuffle across a sharded H axis can force cross-shard
        # regrouping, and its 1.22x win was only measured single-chip
        # (512px bf16). Pass block1_s2d=True to A/B it there on hardware.
        self.block1_s2d = (placement is None if block1_s2d is None
                           else bool(block1_s2d))
        if placement is not None:
            self.params = placement.replicated(params)
        lax_precision, compute_dtype = precision_config(precision)
        self.model = vgg19.VGG19Features(self.params, lax_precision,
                                         compute_dtype, remat,
                                         self.block1_s2d)

        self.is_running = False
        self.is_starting = False
        self.t = 0
        self._input = None          # (1, H, W, 3) f32 device array
        self.content = None         # (1, H, W, 3) f32 device array
        # Content features are stored ONLY for layers the current objective
        # needs and recomputed (from self.content) when a weight-structure
        # change needs more — numerically identical to the reference's
        # store-everything (features are a pure function of the content
        # image) but ~10x less HBM at high resolution.
        self.features = None        # dict blob -> device array (lazy subset)
        self.grams = None           # dict blob -> (c, c) device array
        self.style_hw = None        # grid of the last set_style image

        # Until SetWeights arrives the reference weights every (layer, loss)
        # at 1 (worker.py:130-133).
        self.weights = {name: {layer: 1.0 for layer in vgg19.BLOB_NAMES}
                        for name in LOSS_NAMES}
        self.scalar_params = {name: 1.0 for name in SCALAR_LOSS_NAMES}

        self.temporal_target = None  # (1, H, W, 3) prev frame (video mode)

        self.optimizer_name = 'lbfgs'
        self.step_size = STEP_SIZES['lbfgs']
        self.opt_state = None
        self._needs_init = False    # L-BFGS (loss, grad) cache unprimed

        # First-eval gradient-RMS norms, persisted across weight/size changes,
        # cleared only on reset (worker.py:137,172-175).
        self.norm_vals = {}
        self.norm_set = {}

        self.traces = []

        # Device-resident caches: per-iteration host->device uploads over a
        # TPU tunnel cost ~70 ms each, so the small step inputs (weight
        # vectors, tv/p scalars, step size) are uploaded once and reused
        # until set_weights/set_step_size invalidates them.
        self._weights_cache = None   # (spec, layer_weights, scalars)
        self._step_size_dev = None

    # -- properties ---------------------------------------------------------

    @property
    def input(self):
        return self._input

    @property
    def input_hw(self):
        return None if self._input is None else tuple(self._input.shape[1:3])

    def layers(self):
        return list(vgg19.BLOB_NAMES)

    def _place_image(self, x):
        return x if self.placement is None else self.placement.image(x)

    def _place_state(self, tree):
        return tree if self.placement is None else self.placement.state(tree)

    def _place_replicated(self, tree):
        return tree if self.placement is None else self.placement.replicated(tree)

    def spec(self):
        return ObjectiveSpec.from_weights(self.weights, self.scalar_params)

    # -- state machine (reference worker.py:140-229) -------------------------

    def check_consistency(self):
        if self._input is not None and self.content is not None and self.grams:
            if self._input.shape == self.content.shape:
                return True
        return False

    def objective_changed(self):
        if self.opt_state is not None:
            mod = OPTIMIZERS[self.optimizer_name]
            self.opt_state = mod.objective_changed(self.opt_state)
            if self.optimizer_name == 'lbfgs':
                self._needs_init = True

    def pause(self):
        self.is_running = False
        self.is_starting = False

    def resample_input(self, size):
        size = tuple(int(s) for s in size)
        if self._input is not None and self.opt_state is not None:
            mod = OPTIMIZERS[self.optimizer_name]
            self.opt_state = self._place_state(mod.resample(self.opt_state, size))
            self._input = self.opt_state['x']
            if self.optimizer_name == 'lbfgs':
                self._needs_init = True
        else:
            self._input = self._place_image(
                jnp.zeros((1,) + size + (3,), jnp.float32))
        self._start()
        self.objective_changed()

    def resample_content(self, size):
        size = tuple(int(s) for s in size)
        if self.content is not None:
            self.content = self._place_image(
                resize_nhwc(self.content, size, 'lanczos3'))
        else:
            self.content = self._place_image(
                jnp.zeros((1,) + size + (3,), jnp.float32))
        self.features = self._content_features()
        self._start()
        self.objective_changed()

    def _lbfgs_history_dtype(self):
        """Storage dtype for fresh L-BFGS curvature buffers: bf16 in the
        bf16 speed mode on large-enough grids (optim.lbfgs
        history_dtype_for — small grids diverge with bf16 pairs; f32
        parity mode always keeps f32, golden tests untouched)."""
        from ..optim import lbfgs as _lbfgs
        _, compute_dtype = precision_config(self.precision)
        return _lbfgs.history_dtype_for(compute_dtype,
                                        self._input.shape[-3:-1])

    def reset(self):
        self.norm_vals = {}
        self.norm_set = {}
        self.t = 0
        if self._input is not None:
            mod = OPTIMIZERS[self.optimizer_name]
            if self.optimizer_name == 'lbfgs':
                self.opt_state = self._place_state(
                    mod.init(self._input, self.n_corr,
                             history_dtype=self._lbfgs_history_dtype()))
                self._needs_init = True
            else:
                self.opt_state = self._place_state(mod.init(self._input))
                self._needs_init = False
        else:
            self.opt_state = None

    def start(self):
        self.is_starting = True
        self._start()
        return self.is_running

    def _start(self):
        if self.is_starting:
            if self._input is not None and self.content is not None and self.grams:
                if self._input.shape == self.content.shape:
                    if self.opt_state is None:
                        self.reset()
                    self.is_starting = False
                    self.is_running = True

    def set_input(self, image, preprocessed=False):
        """Sets the optimization iterate. preprocessed=True means `image`
        is ALREADY a (1, H, W, 3) float32 mean-subtracted device array
        (video mode prepares the next frame's warm start as one fused
        device op on the previous frame's async output — re-preprocessing
        would double-subtract and cost an extra dispatch)."""
        image = self._place_image(image if preprocessed
                                  else vgg19.preprocess(image))
        if self._input is not None and self._input.shape == image.shape:
            self._input = image
            if self.opt_state is not None:
                self.opt_state = dict(self.opt_state)
                self.opt_state['x'] = image
            self.objective_changed()
        elif self.opt_state is not None:
            mod = OPTIMIZERS[self.optimizer_name]
            self.opt_state = self._place_state(
                mod.resample(self.opt_state, None, new_x=image))
            self._input = self.opt_state['x']
            if self.optimizer_name == 'lbfgs':
                self._needs_init = True
            self._start()
        else:
            self._input = image
            self.reset()
            self._start()

    def set_content(self, image):
        self.content = self._place_image(vgg19.preprocess(image))
        self.features = self._content_features()
        self._start()
        self.objective_changed()

    def _content_features(self, layers=None):
        """Computes content features for the given blob names (default: the
        current objective's content layers). Under the BF16_FEED loss feed
        the features are STORED in the compute dtype — `feat - content`
        must not promote the bf16 tap back to f32, or the tap-cast backward
        copy the feed exists to remove reappears. One cast at
        set_content time, not per step."""
        if layers is None:
            layers = self.spec().content_layers
        if not layers:
            return {}
        feats = dict(self.model.forward(self.content, tuple(layers)))
        from .objective import content_store_dtype
        dtype = content_store_dtype(self.model.compute_dtype)
        if dtype != jnp.float32:
            feats = {l: f.astype(dtype) for l, f in feats.items()}
        return self._place_state(feats)

    def set_style(self, image):
        image = self._place_image(vgg19.preprocess(image))
        self.style_hw = tuple(image.shape[1:3])
        features = self.model.forward(image)
        self.grams = self._place_replicated(
            {layer: gram_matrix(feat, channels=vgg19.layer_channels(layer))
             for layer, feat in features.items()})
        self._start()
        self.objective_changed()

    def set_optimizer(self, name):
        """Swaps the optimizer class; the caller decides whether to reset
        (the worker resets when the type changed, worker.py:387-391)."""
        if name not in OPTIMIZERS:
            raise ValueError('Invalid optimizer type: %r' % (name,))
        self.optimizer_name = name

    def set_step_size(self, step_size):
        self.step_size = float(step_size)
        self._step_size_dev = None

    def set_weights(self, weights, params):
        self.weights = {name: dict(weights.get(name, {})) for name in LOSS_NAMES}
        temporal = self.scalar_params.get('temporal')
        self.scalar_params = dict(params)
        if temporal and 'temporal' not in self.scalar_params:
            self.scalar_params['temporal'] = temporal
        self._weights_cache = None
        self.objective_changed()

    def set_temporal(self, image, weight, preprocessed=False):
        """Enables the video temporal-consistency loss toward a previous
        stylized frame (HxWx3 RGB; preprocessed=True accepts a ready
        (1, H, W, 3) mean-subtracted array — see set_input). Changes the
        objective."""
        self.temporal_target = self._place_image(
            image if preprocessed else vgg19.preprocess(image))
        self.scalar_params['temporal'] = float(weight)
        self._weights_cache = None
        self.objective_changed()

    def clear_temporal(self):
        if self.scalar_params.pop('temporal', None) is not None:
            self._weights_cache = None
            self.objective_changed()
        self.temporal_target = None

    # -- stepping -------------------------------------------------------------

    def _gather_inputs(self, spec):
        if self._weights_cache is None or self._weights_cache[0] != spec:
            layer_weights = {l: jnp.asarray(v) for l, v in
                             weights_to_arrays(self.weights, spec).items()}
            scalars = {k: jnp.asarray(v) for k, v in
                       scalars_to_arrays(self.scalar_params).items()}
            self._weights_cache = (spec, layer_weights, scalars)
        _, layer_weights, scalars = self._weights_cache

        norms_vals, norms_set = empty_norms(spec)
        for key in spec.norm_keys:
            if key in self.norm_vals:
                norms_vals[key] = self.norm_vals[key]
                norms_set[key] = self.norm_set[key]
        missing = [l for l in spec.content_layers if l not in self.features]
        if missing and self.content is not None:
            # A weight-structure change added content layers; recompute their
            # features from the stored content image (pure function).
            self.features.update(self._content_features(spec.content_layers))
        inputs = {
            'content_feats': {l: self.features[l] for l in spec.content_layers},
            'grams': {l: self.grams[l] for l in spec.style_layers},
            'layer_weights': layer_weights,
            'scalars': scalars,
            'norms_vals': norms_vals,
            'norms_set': norms_set,
        }
        if spec.temporal:
            if (self.temporal_target is None
                    or self.temporal_target.shape != self._input.shape):
                raise ValueError('temporal loss enabled but no matching '
                                 'temporal target set (set_temporal)')
            inputs['temporal_target'] = self.temporal_target
        return inputs

    def _step_size_device(self):
        if self._step_size_dev is None:
            self._step_size_dev = jnp.float32(self.step_size)
        return self._step_size_dev

    def _absorb_norms(self, spec, norms):
        norms_vals, norms_set = norms
        for key in spec.norm_keys:
            self.norm_vals[key] = norms_vals[key]
            self.norm_set[key] = norms_set[key]

    def _absorb_trace(self, spec, trace_vals):
        # One host transfer for the whole trace instead of a sync per scalar.
        trace_vals = [float(v) for v in np.asarray(jax.device_get(trace_vals))]
        trace = Trace()
        for key, value in zip(spec.trace_keys, trace_vals):
            if key == 'loss':
                trace('time', time.perf_counter())
            trace(key, value)
        self.traces.append(trace)
        return trace

    def _absorb(self, spec, norms, trace_vals):
        self._absorb_norms(spec, norms)
        return self._absorb_trace(spec, trace_vals)

    def _prime_if_needed(self, spec, eval_fn):
        """Primes the L-BFGS (loss, grad) cache — the synchronous
        single-step path. Fused dispatches never call this: begin_steps
        runs a stale eval INSIDE the scan program (primed=True) and its
        trace rides the returned handle."""
        if self._needs_init:
            inputs = self._gather_inputs(spec)
            self.opt_state, norms, trace_vals = eval_fn(
                self.params, self.opt_state, inputs)
            self._absorb_norms(spec, norms)
            self._absorb_trace(spec, trace_vals)
            self._needs_init = False

    def step(self, fetch_image=True):
        """Runs one optimizer iteration. Returns (deprocessed HxWx3 float32
        RGB image, trace dict) like reference worker.py:303-310. With
        fetch_image=False the image stays on device (None is returned) —
        callers that snapshot on a throttle avoid the host transfer."""
        self.t += 1
        spec = self.spec()
        step_fn, eval_fn = build_step_fns(spec, self.optimizer_name,
                                          self.precision,
                                          use_pallas=self.use_pallas,
                                          remat=self.remat,
                                          block1_s2d=self.block1_s2d)
        self._prime_if_needed(spec, eval_fn)

        inputs = self._gather_inputs(spec)
        self.opt_state, norms, trace_vals = step_fn(
            self.params, self.opt_state, inputs, self._step_size_device())
        self._input = self.opt_state['x']
        trace = self._absorb(spec, norms, trace_vals)
        trace('fevals', self.t)
        image = np.asarray(vgg19.deprocess(self._input)) if fetch_image else None
        return image, trace.data

    def begin_steps(self, n_steps):
        """Dispatches n_steps fused iterations (one lax.scan program) WITHOUT
        waiting for them: JAX async dispatch returns future arrays, so the
        call costs only the host-side enqueue (~50 ms over the tunnel vs
        ~0.5 s for a full round trip). The engine state advances to the
        futures immediately — a subsequent begin_steps chains onto them on
        device, which is how the serving driver keeps the device busy while
        the host drains results (pipelined dispatch).

        Returns a handle for collect_steps. Handles MUST be collected in
        dispatch order (self.traces is append-ordered)."""
        spec = self.spec()
        # A stale L-BFGS (loss, grad) cache primes INSIDE the scan program
        # (primed=True): one dispatch instead of eval + scan — the common
        # case for every video frame and every serving dispatch right
        # after a control change. The prime trace rides the returned
        # handle and lands at THIS dispatch's collect, in dispatch order.
        primed = self._needs_init and self.optimizer_name == 'lbfgs'
        scan_fn = build_scan_fn(spec, self.optimizer_name, self.precision,
                                n_steps, use_pallas=self.use_pallas,
                                remat=self.remat,
                                block1_s2d=self.block1_s2d,
                                primed=primed)
        inputs = self._gather_inputs(spec)
        prime = None
        if primed:
            self.opt_state, norms, traces, image, prime_trace = scan_fn(
                self.params, self.opt_state, inputs,
                self._step_size_device())
            prime = (spec, prime_trace)
            self._needs_init = False
        else:
            self.opt_state, norms, traces, image = scan_fn(
                self.params, self.opt_state, inputs,
                self._step_size_device())
        self._input = self.opt_state['x']
        norms_vals, norms_set = norms
        for key in spec.norm_keys:
            self.norm_vals[key] = norms_vals[key]
            self.norm_set[key] = norms_set[key]
        self.t += n_steps
        return StepsDispatch(spec, traces, n_steps, self.t, image, prime)

    def _materialize_traces(self, dispatch, columns, now):
        out = []
        for i in range(dispatch.n_steps):
            trace = Trace()
            for key, col in zip(dispatch.spec.trace_keys, columns):
                if key == 'loss':
                    trace('time', now)
                trace(key, float(col[i]))
            trace('fevals', dispatch.t_end - dispatch.n_steps + 1 + i)
            self.traces.append(trace)
            out.append(trace)
        return out

    def collect_steps(self, dispatch, fetch_image=True):
        """Blocks on a begin_steps handle and materializes its results:
        appends one Trace per iteration and returns (image-or-None, traces).
        A primed dispatch's in-scan eval trace is absorbed first (same
        host transfer), so the trace history reads eval-then-steps per
        dispatch. The image is the iterate as of the END of that dispatch
        — computed on device as a scan output of its own, so it survives
        the state donation even when later dispatches are already in
        flight."""
        # One host transfer for all n_steps traces (+ the prime trace).
        payload = [dispatch.traces]
        if dispatch.prime is not None:
            payload.append(dispatch.prime[1])
        fetched = jax.device_get(payload)
        if dispatch.prime is not None:
            self._absorb_trace(dispatch.prime[0], fetched[1])
            dispatch.prime = None
        columns = [np.asarray(col) for col in fetched[0]]
        traces = self._materialize_traces(dispatch, columns,
                                          time.perf_counter())
        image = np.asarray(dispatch.image) if fetch_image else None
        return image, traces

    def collect_steps_many(self, dispatches, fetch_image=True):
        """Blocks on SEVERAL begin_steps handles with ONE host transfer:
        a single device_get covers every handle's traces, prime traces and
        images, so a tunneled backend pays one link round trip per BATCH
        of dispatches instead of one per dispatch (video mode collects
        frames in batches of three this way). Handles must be this
        engine's, consecutive, in dispatch order. Returns
        [(image-or-None, traces), ...]."""
        payload = [[d.traces for d in dispatches],
                   [d.prime[1] for d in dispatches if d.prime is not None]]
        if fetch_image:
            payload.append([d.image for d in dispatches])
        fetched = jax.device_get(payload)
        images = fetched.pop() if fetch_image else [None] * len(dispatches)
        primes = iter(fetched[1])
        now = time.perf_counter()
        out = []
        for dispatch, cols, image in zip(dispatches, fetched[0], images):
            if dispatch.prime is not None:
                self._absorb_trace(dispatch.prime[0], next(primes))
                dispatch.prime = None
            columns = [np.asarray(c) for c in cols]
            traces = self._materialize_traces(dispatch, columns, now)
            out.append((None if image is None else np.asarray(image),
                        traces))
        return out

    def run_steps(self, n_steps, fetch_image=True):
        """Runs n_steps optimizer iterations fused into ONE device dispatch
        (lax.scan) — zero host round-trips per iteration. Weights and step
        size are fixed for the duration (interactive serving uses step()
        instead so changes apply within one iteration). Appends one trace
        per iteration; returns (image-or-None, last trace dict)."""
        image, traces = self.collect_steps(self.begin_steps(n_steps),
                                           fetch_image)
        return image, traces[-1].data

    def snapshot(self):
        """Fetches the current iterate as a deprocessed HxWx3 float32 RGB
        array (one host transfer)."""
        return np.asarray(vgg19.deprocess(self._input))

    def prewarm(self, hw, ks=(1,), style_hw=None, from_hw=None,
                scalar_overrides=None):
        """Compiles every program a live session needs at input grid hw
        WITHOUT touching this session's state. The step/eval/scan builders
        are module-level caches keyed on (objective structure, optimizer,
        precision, flags) and XLA executables key on input shapes, so a
        throwaway engine with the same structure compiles exactly the
        programs the live engine will dispatch after a resize to hw — a
        TPU-native answer to "resolution change = minutes of remote
        compile" (no reference counterpart; Caffe had no compile step).

        ks are the fused chunk lengths to warm (1 = the interactive step;
        the serving driver passes its adaptive sub-chunk length too).
        style_hw defaults to the live style grid so the style pipeline
        reuses already-compiled programs instead of adding new ones.
        from_hw (default: the live grid) additionally warms the RESIZE
        path itself — the optimizer-moment resample programs keyed on
        (from_hw -> hw) that a real size change dispatches (set_input's
        warm-start branch) — by seeding the clone at from_hw and replaying
        the live resize sequence onto hw. Runs one real step per program
        on dummy data (compile dominates; the persistent compilation cache
        then covers future processes). Thread-safe alongside a live engine
        stepping in another thread — serving prewarm runs on its own
        executor. Returns wall seconds.

        scalar_overrides, if given, is merged over the live scalar params —
        used to warm a DIFFERENT objective structure than the live one
        (e.g. video mode warms the temporal-loss programs during the first
        frame, before set_temporal has ever run)."""
        t0 = time.perf_counter()
        clone = StyleTransfer(self.params, precision=self.precision,
                              n_corr=self.n_corr, placement=self.placement,
                              use_pallas=self.use_pallas, remat=self.remat,
                              block1_s2d=self.block1_s2d)
        clone.weights = {name: dict(v) for name, v in self.weights.items()}
        clone.scalar_params = dict(self.scalar_params)
        if scalar_overrides:
            clone.scalar_params.update(scalar_overrides)
        clone.optimizer_name = self.optimizer_name
        clone.step_size = self.step_size
        hw = tuple(int(v) for v in hw)
        if style_hw is None:
            style_hw = self.style_hw or hw
        if from_hw is None:
            from_hw = self.input_hw
        from_hw = tuple(int(v) for v in from_hw) if from_hw else None
        rng = np.random.RandomState(0)
        if from_hw and from_hw != hw:
            # Seed at the live grid (programs already compiled — cache
            # hits), then resize exactly like the serving/CLI path does:
            # set_input at the new shape takes the warm-start branch and
            # compiles the (from_hw -> hw) moment-resample programs.
            clone.set_content(
                rng.randint(0, 256, from_hw + (3,)).astype(np.uint8))
            clone.set_input(
                rng.randint(0, 256, from_hw + (3,)).astype(np.uint8))
        clone.set_style(
            rng.randint(0, 256, tuple(style_hw) + (3,)).astype(np.uint8))
        if clone.spec().temporal:
            clone.set_temporal(
                rng.randint(0, 256, hw + (3,)).astype(np.uint8),
                clone.scalar_params['temporal'])
        clone.set_input(rng.randint(0, 256, hw + (3,)).astype(np.uint8))
        clone.set_content(rng.randint(0, 256, hw + (3,)).astype(np.uint8))
        if not clone.start():
            raise RuntimeError('prewarm engine failed to start')
        for k in ks:
            if int(k) <= 1:
                clone.step()
            else:
                clone.collect_steps(clone.begin_steps(int(k)), True)
        return time.perf_counter() - t0

    def write_trace(self, filename):
        """Dumps the accumulated trace history to CSV (worker.py:312-315).
        Covers every collected dispatch; an uncollected in-flight handle's
        traces (including its prime trace) are not yet part of history."""
        import pandas as pd
        df = pd.DataFrame([t.data for t in self.traces])
        df.index.name = 'step'
        df.to_csv(filename)

"""Batched multi-session engine: N independent style-transfer jobs as lanes
of ONE vmapped, jitted step (BASELINE.json config 3).

Where the reference serves N users with N OS-process pairs behind the router
(router.py:73-83), this engine packs jobs of one (resolution, objective
structure, optimizer) bucket into stacked pytrees with a leading lane axis
and steps them all with a single device dispatch — batched convs fill the
MXU, and the lane axis can shard over a mesh 'data' axis
(parallel/batch.DataPlacement). Per-lane state: iterate, optimizer pytree,
content features, style Grams, loss-weight VALUES, tv/p scalars, step size,
first-eval norms, and iterate counters.

Inactive lanes carry zeros and are skipped in the results; they still
consume compute (the batch exists to fill the chip — occupancy is the
serving tier's job).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..models import vgg19
from ..ops.gram import gram_matrix
from ..optim import OPTIMIZERS, STEP_SIZES
from ..parallel.batch import (build_masked_batched_scan_fn,
                              build_masked_batched_step_fns)
from ..utils.tracing import Trace
from .objective import (
    ObjectiveSpec,
    content_store_dtype,
    scalars_to_arrays,
    weights_to_arrays,
)
from .steps import precision_config


def _lane_set(tree, lane, value_tree):
    """Writes a per-lane sub-pytree into a stacked pytree at index lane."""
    return jax.tree_util.tree_map(
        lambda buf, val: buf.at[lane].set(val), tree, value_tree)


class BatchedStyleTransfer:
    """Up to max_lanes concurrent jobs sharing (hw, spec, optimizer)."""

    def __init__(self, params, weights, scalar_params, hw, max_lanes,
                 optimizer='adam', precision='float32', n_corr=10,
                 placement=None):
        self.params = params
        self.spec = ObjectiveSpec.from_weights(weights, scalar_params)
        self.default_weights = weights
        self.default_scalars = scalar_params
        self.hw = tuple(int(s) for s in hw)
        self.max_lanes = int(max_lanes)
        self.optimizer_name = optimizer
        self.precision = precision
        self.n_corr = n_corr
        self.placement = placement

        lax_precision, compute_dtype = precision_config(precision)
        self.model = vgg19.VGG19Features(params, lax_precision, compute_dtype)

        self.active = [False] * self.max_lanes
        self.running = [False] * self.max_lanes
        self.t = [0] * self.max_lanes
        # Per-lane L-BFGS priming flag: lane i's (loss, grad) cache is stale
        # (new job or objective change) and must be re-evaluated before its
        # next step. Per-lane — an engine-wide flag loses the mark for a
        # PAUSED lane when a step primes only the running ones, and the lane
        # would resume with a zero gradient (reference semantics:
        # optimizers.py:62-65,121-125 always evaluate before first use).
        self._needs_prime = [False] * self.max_lanes

        zero_img = jnp.zeros((1,) + self.hw + (3,), jnp.float32)
        mod = OPTIMIZERS[optimizer]
        self._history_dtype = None
        if optimizer == 'lbfgs':
            from ..optim import lbfgs as _lbfgs
            self._history_dtype = _lbfgs.history_dtype_for(compute_dtype,
                                                           self.hw)
        lane_state = (mod.init(zero_img, n_corr,
                               history_dtype=self._history_dtype)
                      if optimizer == 'lbfgs' else mod.init(zero_img))
        feats = self.model.forward(zero_img)
        self._content_dtype = content_store_dtype(compute_dtype)
        lane_inputs = {
            'content_feats': {l: jnp.zeros_like(feats[l],
                                                dtype=self._content_dtype)
                              for l in self.spec.content_layers},
            'grams': {l: jnp.zeros((vgg19.layer_channels(l),) * 2,
                                   jnp.float32)
                      for l in self.spec.style_layers},
            'layer_weights': {l: jnp.asarray(v) for l, v in
                              weights_to_arrays(weights, self.spec).items()},
            'scalars': {k: jnp.asarray(v) for k, v in
                        scalars_to_arrays(scalar_params).items()},
            'norms_vals': {k: jnp.float32(0.0) for k in self.spec.norm_keys},
            'norms_set': {k: jnp.bool_(False) for k in self.spec.norm_keys},
        }
        stack = lambda tree: jax.tree_util.tree_map(
            lambda leaf: jnp.stack([leaf] * self.max_lanes), tree)
        self.states = stack(lane_state)
        self.inputs = stack(lane_inputs)
        self.step_sizes = jnp.full((self.max_lanes,),
                                   STEP_SIZES[optimizer], jnp.float32)
        if placement is not None:
            self._replace(placement.place(self.states),
                          placement.place(self.inputs))
            self.step_sizes = placement.place(self.step_sizes)

    def _replace(self, states=None, inputs=None):
        if states is not None:
            self.states = states
        if inputs is not None:
            self.inputs = inputs

    def _place(self, tree):
        return tree if self.placement is None else self.placement.place(tree)

    # -- lane lifecycle -------------------------------------------------------

    def free_lane(self):
        """Index of a free lane, or None when the bucket is full."""
        for i, busy in enumerate(self.active):
            if not busy:
                return i
        return None

    def add_job(self, content, style, input_image, weights=None,
                scalar_params=None, step_size=None, lane=None,
                lane_state=None, t=0, norms=None):
        """Adds a job; returns its lane id. Images are HxWx3 RGB arrays at
        this bucket's resolution.

        lane_state, if given, is a pre-built per-lane optimizer pytree at
        this bucket's resolution (e.g. warm-start state resampled from
        another bucket, the batched analog of the reference's
        optimizers.py:29-40 resample); input_image is then ignored in
        favor of the state's iterate. t carries the lane's iterate counter
        across a migration.

        norms, if given, is a (vals, set) pair from lane_norms(): the
        session's first-eval gradient-RMS norm state, carried across a
        requeue/migration so the lane keeps optimizing the SAME normalized
        objective (reference semantics: norms persist across weight/size
        changes, cleared only by reset — worker.py:137,172-175). Omitted,
        the lane re-anchors at its first evaluation (correct for resets
        and fresh jobs)."""
        if lane is None:
            lane = self.free_lane()
        if lane is None:
            raise RuntimeError('no free lane (bucket of %d full)'
                               % self.max_lanes)
        weights = weights if weights is not None else self.default_weights
        scalar_params = (scalar_params if scalar_params is not None
                         else self.default_scalars)
        spec_check = ObjectiveSpec.from_weights(weights, scalar_params)
        if spec_check != self.spec:
            raise ValueError('job objective structure does not match this '
                             'bucket (got %r, bucket %r)'
                             % (spec_check, self.spec))

        content_x = vgg19.preprocess(content)
        style_x = vgg19.preprocess(style)
        if lane_state is not None:
            input_x = lane_state['x']
        else:
            input_x = vgg19.preprocess(input_image)
        if content_x.shape[1:3] != self.hw or input_x.shape[1:3] != self.hw:
            raise ValueError('job resolution does not match bucket %s'
                             % (self.hw,))

        feats = self.model.forward(content_x)
        style_feats = self.model.forward(style_x)
        lane_inputs = {
            'content_feats': {l: feats[l].astype(self._content_dtype)
                              for l in self.spec.content_layers},
            'grams': {l: gram_matrix(style_feats[l],
                                     channels=vgg19.layer_channels(l))
                      for l in self.spec.style_layers},
            'layer_weights': {l: jnp.asarray(v) for l, v in
                              weights_to_arrays(weights, self.spec).items()},
            'scalars': {k: jnp.asarray(v) for k, v in
                        scalars_to_arrays(scalar_params).items()},
            'norms_vals': {k: jnp.float32(0.0) for k in self.spec.norm_keys},
            'norms_set': {k: jnp.bool_(False) for k in self.spec.norm_keys},
        }
        if norms is not None:
            nv, ns = norms
            lane_inputs['norms_vals'] = {
                k: jnp.float32(nv[k]) if k in nv else jnp.float32(0.0)
                for k in self.spec.norm_keys}
            lane_inputs['norms_set'] = {
                k: jnp.bool_(ns[k]) if k in ns else jnp.bool_(False)
                for k in self.spec.norm_keys}
        if lane_state is None:
            mod = OPTIMIZERS[self.optimizer_name]
            lane_state = (mod.init(input_x, self.n_corr,
                                   history_dtype=self._history_dtype)
                          if self.optimizer_name == 'lbfgs'
                          else mod.init(input_x))

        self.inputs = self._place(_lane_set(self.inputs, lane, lane_inputs))
        self.states = self._place(_lane_set(self.states, lane, lane_state))
        if step_size is None:
            step_size = STEP_SIZES[self.optimizer_name]
        self.step_sizes = self._place(
            self.step_sizes.at[lane].set(float(step_size)))
        self.active[lane] = True
        self.running[lane] = True
        self.t[lane] = int(t)
        if self.optimizer_name == 'lbfgs':
            self._needs_prime[lane] = True
        return lane

    def lane_state(self, lane):
        """Extracts one lane's optimizer pytree (for warm-start migration
        to another resolution bucket)."""
        return jax.tree_util.tree_map(lambda buf: buf[lane], self.states)

    def lane_norms(self, lane):
        """One lane's first-eval norm state as a (vals, set) dict pair —
        precision- and resolution-independent f32 scalars, the add_job
        norms= payload for carrying the session's normalized objective
        across a requeue or bucket migration. Values stay on device (the
        carry never round-trips the host)."""
        vals = {k: self.inputs['norms_vals'][k][lane]
                for k in self.spec.norm_keys}
        set_ = {k: self.inputs['norms_set'][k][lane]
                for k in self.spec.norm_keys}
        return vals, set_

    def norms_host(self):
        """EVERY lane's norm state in two host transfers:
        (keys, (n_keys, max_lanes) f32 vals, (n_keys, max_lanes) bool set).
        Per-key fetches would cost a tunnel round trip each (~70 ms x 19
        keys); the persist loop uses this to capture all lanes at once."""
        keys = list(self.spec.norm_keys)
        vals = np.asarray(jnp.stack(
            [self.inputs['norms_vals'][k] for k in keys]))
        set_ = np.asarray(jnp.stack(
            [self.inputs['norms_set'][k] for k in keys]))
        return keys, vals, set_

    def remove_job(self, lane):
        self.active[lane] = False
        self.running[lane] = False
        self.t[lane] = 0
        self._needs_prime[lane] = False

    def set_running(self, lane, running):
        """Pauses/resumes one lane; paused lanes keep their optimizer state
        and norms frozen (the batched step masks their writes)."""
        self.running[lane] = bool(running)

    def any_running(self):
        return any(r and a for r, a in zip(self.running, self.active))

    def _run_mask(self):
        import jax.numpy as jnp
        return jnp.asarray([bool(r and a) for r, a in
                            zip(self.running, self.active)])

    def set_step_size(self, lane, step_size):
        self.step_sizes = self._place(
            self.step_sizes.at[lane].set(float(step_size)))

    def set_lane_weights(self, lane, weights, scalar_params):
        """Updates one lane's weight VALUES (structure must match the
        bucket); clears transient optimizer state like the reference's
        objective_changed."""
        spec_check = ObjectiveSpec.from_weights(weights, scalar_params)
        if spec_check != self.spec:
            raise ValueError('weight structure does not match this bucket')
        lw = {l: jnp.asarray(v) for l, v in
              weights_to_arrays(weights, self.spec).items()}
        sc = {k: jnp.asarray(v) for k, v in
              scalars_to_arrays(scalar_params).items()}
        new_inputs = dict(self.inputs)
        new_inputs['layer_weights'] = _lane_set(
            self.inputs['layer_weights'], lane, lw)
        new_inputs['scalars'] = _lane_set(self.inputs['scalars'], lane, sc)
        self.inputs = self._place(new_inputs)
        self._lane_objective_changed(lane)

    def _lane_objective_changed(self, lane):
        mod = OPTIMIZERS[self.optimizer_name]
        lane_state = jax.tree_util.tree_map(lambda buf: buf[lane], self.states)
        lane_state = mod.objective_changed(lane_state)
        self.states = self._place(_lane_set(self.states, lane, lane_state))
        if self.optimizer_name == 'lbfgs':
            self._needs_prime[lane] = True

    def _prime_pending(self, eval_fn):
        """Re-evaluates (loss, grad) for running lanes whose cache is stale,
        masked so already-primed and paused lanes are untouched. Paused
        stale lanes keep their flag until they actually resume."""
        if eval_fn is None:
            return
        prime = [p and r and a for p, r, a in
                 zip(self._needs_prime, self.running, self.active)]
        if not any(prime):
            return
        prime_mask = jnp.asarray(prime)
        self.states, norms, _ = eval_fn(self.params, self.states,
                                        self.inputs, prime_mask)
        inputs = dict(self.inputs)
        inputs['norms_vals'], inputs['norms_set'] = norms
        self.inputs = inputs
        for lane, primed in enumerate(prime):
            if primed:
                self._needs_prime[lane] = False

    # -- stepping -------------------------------------------------------------

    def begin_steps_all(self, n_steps):
        """Dispatches K fused optimizer steps for every running lane WITHOUT
        collecting (JAX async dispatch): the lane states advance to future
        arrays and the trace columns ride in the returned handle for
        collect_steps_all. Buckets placed on DISJOINT device subsets
        (serve/pool.py pool_bucket_devices) overlap their compute through
        this split — a serial begin/collect of blocking dispatches would
        timeshare even separate chips. Returns None when no lane runs."""
        running = [lane for lane, busy in enumerate(self.active)
                   if busy and self.running[lane]]
        if not running:
            return None
        _, eval_fn = build_masked_batched_step_fns(
            self.spec, self.optimizer_name, self.precision)
        mask = self._run_mask()
        self._prime_pending(eval_fn)

        if n_steps == 1:
            step_fn, _ = build_masked_batched_step_fns(
                self.spec, self.optimizer_name, self.precision)
            self.states, norms, traces = step_fn(
                self.params, self.states, self.inputs, self.step_sizes, mask)
        else:
            scan_fn = build_masked_batched_scan_fn(
                self.spec, self.optimizer_name, self.precision, n_steps)
            self.states, norms, traces = scan_fn(
                self.params, self.states, self.inputs, self.step_sizes, mask)
        inputs = dict(self.inputs)
        inputs['norms_vals'], inputs['norms_set'] = norms
        self.inputs = inputs
        t_end = {}
        for lane in running:
            self.t[lane] += n_steps
            t_end[lane] = self.t[lane]
        return {'traces': traces, 'k': n_steps, 'lanes': running,
                't_end': t_end}

    def collect_steps_all(self, handle):
        """Blocks on a begin_steps_all handle; returns {lane: [trace dict
        per step]} for the lanes that ran in that dispatch."""
        if handle is None:
            return {}
        k = handle['k']
        # (B,) columns for a single step, (B, K) for a fused scan.
        columns = [np.asarray(c) for c in jax.device_get(handle['traces'])]
        out = {}
        for lane in handle['lanes']:
            lane_traces = []
            for j in range(k):
                trace = Trace()
                for key, col in zip(self.spec.trace_keys, columns):
                    trace(key, float(col[lane] if k == 1 else col[lane, j]))
                trace('fevals', handle['t_end'][lane] - k + 1 + j)
                lane_traces.append(trace.data)
            out[lane] = lane_traces
        return out

    def step_all(self):
        """One optimizer step for every RUNNING lane (one device dispatch;
        paused/inactive lanes' state is mask-frozen). Returns {lane: trace
        dict} for running lanes."""
        return {lane: traces[0]
                for lane, traces in self.run_steps_all(1).items()}

    def run_steps_all(self, n_steps):
        """K fused optimizer steps for every running lane in ONE dispatch
        (vmap of lax.scan) — the batched analog of StyleTransfer.run_steps.
        Returns {lane: [trace dict per step]} for running lanes."""
        return self.collect_steps_all(self.begin_steps_all(n_steps))

    def lane_image(self, lane):
        """Fetches one lane's deprocessed iterate (HxWx3 float32 RGB)."""
        x = jax.tree_util.tree_map(lambda buf: buf[lane], self.states)['x']
        return np.asarray(vgg19.deprocess(x))

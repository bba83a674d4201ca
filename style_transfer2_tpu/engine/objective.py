"""The style-transfer objective as one fused, differentiable XLA program.

Replicates the math of the reference's StyleTransfer.opfunc
(worker.py:231-301) exactly:

  * per-layer content / style / deep-dream losses with analytic injected
    gradients, each divided by a *first-evaluation gradient-RMS norm* that is
    cached until reset (worker.py:137,253-277) — the norms are explicit state
    threaded through the jitted step, (value, is_set) pairs per (layer, kind);
  * the style gradient is the reference's half-gradient
    2/(c^2 * chw) * gram_diff @ feat (worker.py:263-264), injected as a vjp
    cotangent — the moral equivalent of Caffe's sectioned backward;
  * TV and p-norm losses evaluated on x/255 with their analytic gradients
    added WITHOUT the 1/255 chain factor (worker.py:283-297, a reference
    quirk preserved deliberately);
  * the trace: per-branch loss and gradient-RMS scalars in evaluation order,
    then scd_loss, t_loss, p_loss, scd_grad, t_grad, p_grad, loss, grad
    (worker.py:236-301; 'time' and 'fevals' are appended host-side).

Which (layer, loss) branches exist is static (a weight-structure change
recompiles — rare, user-driven); the weight VALUES, the norm state, and the
tv/p scalar weights are dynamic so per-iteration changes never recompile.
The tv/p exponents are static so XLA constant-folds the pow at beta=2.
"""

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..models import vgg19
from ..ops.gram import gram_matrix
from ..ops.losses import p_norm, tv_norm, tv_norm_s2d

# Weights with |w| <= this are treated as absent (reference worker.py:234,250).
WEIGHT_EPS = 1e-15

# bf16 speed-mode loss-feed experiments (hardware-A/B'd via
# tools/measure_step.py; flipped only on trace evidence). Both are no-ops
# in float32 parity mode — the golden tests are untouched either way.
# BF16_TAPS: feature taps stay in the compute dtype (the features are
# bf16 upstream anyway, so the f32 tap cast adds no information while
# doubling tap + Gram-feed + cotangent HBM traffic); loss scalars, norms
# and the trace stay float32. Hardware verdict (v5e, on-device spans):
# OFF — slightly SLOWER alone at 512px (4.95 vs 4.75 ms/step) and adds
# nothing over STYLE_EINSUM at 1024/2048 (22.45/105.0 ms either way);
# XLA already fuses the tap casts it was meant to remove.
BF16_TAPS = False
# STYLE_EINSUM: express Gram + style half-gradient as reshape-free
# contractions over the N-D tap so XLA picks the matmul output layout
# the conv backward wants (the (HW, c) dot output pays a measured
# layout-flip copy per style layer: 0.54 ms/step at 1024px, 1.9 at 2048).
# bf16 (speed) mode only: the contraction order differs from the
# reference's (hw,c)@(c,c) dot, which would perturb float32 parity.
# Hardware verdict: ON — 4.64 vs 4.75 ms/step at 512px, 22.45 vs 25.2
# at 1024 no-remat, 105.0 vs 117.9 at 2048 no-remat (v5e bf16; equal
# or better everywhere measured).
STYLE_EINSUM = True
# BF16_FEED: the fully bf16-native loss feed (bf16 speed mode only).
# Round-3 final traces still show the feature-tap cast's BACKWARD paying
# a layout-flip copy on the content taps (vgg19.py tap cast, {2,3,1,0}->
# {3,1,2,0}, 0.32 ms/step at 1024) — BF16_TAPS alone never removed it
# because content features stayed float32, so `feat - content` promoted
# the tap right back. BF16_FEED closes the loop: taps AND content
# features stay in the compute dtype, every loss/RMS reduction is an
# f32-ACCUMULATING contraction over bf16 operands (no materialized f32
# tensors), per-branch trace RMS values come from scalar algebra
# (rms(w*g/n) = |w|*rms(g)/n) instead of an extra pass over the gradient
# tensor, and the injected cotangents are produced natively in bf16 in
# the tap's own layout — the cast node, and its backward copy, cease to
# exist. Implies taps in compute dtype; the style branch uses the
# STYLE_EINSUM contraction with a bf16 gradient output. Hardware verdict
# (v5e bf16, on-device scan spans, fresh-process arms,
# tools/hw_round4_results.jsonl): ON — 4.152 vs 4.307 ms/step at 512px
# (-3.6%), 20.13 vs 20.925 at 1024 (-3.8%), 92.69 vs 96.39 at 2048
# (-3.8%).
BF16_FEED = True
# STYLE_FOLD: fold the style gradient's scalar chain into the (c, c)
# gram_diff BEFORE the gradient contraction, and derive rms(s_raw) in the
# Gram domain: sumsq(s_raw)/size == sum((gd @ gd) * gram) EXACTLY (the
# rows of s_raw are gd^T v_p, so the sum of squares is tr(gd G_raw gd)
# with G_raw = size*gram; verified numerically and in
# tests/test_bf16.py::test_style_fold_tracks_feed). The big-tensor scalar
# multiply — whose output paid a measured layout-flip copy feeding the
# vjp (0.32 ms/step at 1024px, 1.32 at 2048: the 'mul' copy in the
# round-4 final traces) — and the full-tensor sum-of-squares pass both
# cease to exist; per style layer only the Gram einsum and ONE gradient
# einsum touch the tap. BF16_FEED branch only; float32 parity untouched.
# Hardware verdict (part 12, v5e bf16, on-device scan spans, fresh arms):
# size-dependent — 512px +0.7% (noise-negative), 1024px -1.1% (19.212->
# 18.999 ms), 2048px -1.7%/-1.5% (chunk 20/60). Ships as 'auto': fold
# only when the per-image grid is at or above the pixel floor below.
STYLE_FOLD = 'auto'
STYLE_FOLD_MIN_PIXELS = 500_000
LOSS_NAMES = ('content', 'style', 'deepdream')
SCALAR_LOSS_NAMES = ('tv', 'tv_power', 'p', 'p_power')


def _rms(x):
    return jnp.sqrt(jnp.mean(jnp.square(x)))


def content_store_dtype(compute_dtype):
    """Dtype the ENGINE should store content features in: the compute dtype
    under BF16_FEED (so `feat - content` stays bf16 — see the flag comment),
    float32 otherwise. Read at call time; the flag is process-level."""
    if BF16_FEED and compute_dtype == jnp.bfloat16:
        return compute_dtype
    return jnp.float32


@dataclass(frozen=True)
class ObjectiveSpec:
    """Static structure of the objective: which (layer, loss) branches are
    active, and the tv/p exponents. Hashable — keys the compilation cache."""

    branches: tuple  # ((layer_name, has_content, has_style, has_dream), ...)
    tv_power: float = 2.0
    p_power: float = 2.0
    # Temporal-consistency loss toward a previous stylized frame (video
    # mode; not part of the reference objective).
    temporal: bool = False

    @classmethod
    def from_weights(cls, weights, params):
        """Builds a spec from weight dicts shaped like the SetWeights message
        (messages.py:131-149): weights[loss_name][layer] -> float, and the
        scalar params dict with tv/tv_power/p/p_power."""
        branches = []
        for layer in vgg19.BLOB_NAMES:
            has = []
            for loss_name in LOSS_NAMES:
                w = weights.get(loss_name, {}).get(layer, 0.0)
                has.append(w is not None and abs(float(w)) > WEIGHT_EPS)
            if any(has):
                branches.append((layer, has[0], has[1], has[2]))
        temporal = abs(float(params.get('temporal', 0.0) or 0.0)) > WEIGHT_EPS
        return cls(branches=tuple(branches),
                   tv_power=float(params.get('tv_power', 2.0)),
                   p_power=float(params.get('p_power', 2.0)),
                   temporal=temporal)

    @property
    def layers(self):
        return tuple(b[0] for b in self.branches)

    @property
    def content_layers(self):
        return tuple(b[0] for b in self.branches if b[1])

    @property
    def style_layers(self):
        return tuple(b[0] for b in self.branches if b[2])

    @property
    def norm_keys(self):
        """Keys of the first-eval norm state, aligned with branch order."""
        keys = []
        for layer, has_c, has_s, has_d in self.branches:
            if has_c:
                keys.append(layer + ':c')
            if has_s:
                keys.append(layer + ':s')
            if has_d:
                keys.append(layer + ':d')
        return tuple(keys)

    @property
    def trace_keys(self):
        """Names of the scalars the objective returns, in reference order
        (device-side keys only; 'time'/'fevals' are host-side)."""
        keys = []
        for layer, has_c, has_s, has_d in self.branches:
            if has_c:
                keys += ['%s_c_loss' % layer, '%s_c_grad' % layer]
            if has_s:
                keys += ['%s_s_loss' % layer, '%s_s_grad' % layer]
            if has_d:
                keys += ['%s_d_loss' % layer, '%s_d_grad' % layer]
        keys += ['scd_loss', 't_loss', 'p_loss']
        if self.temporal:
            keys += ['temporal_loss']
        keys += ['scd_grad', 't_grad', 'p_grad']
        if self.temporal:
            keys += ['temporal_grad']
        keys += ['loss', 'grad']
        return tuple(keys)


def weights_to_arrays(weights, spec):
    """Dense per-layer weight vectors [content, style, deepdream] for the
    spec's layers; missing entries are 0 (the reference's NaN-from-DataFrame
    behaves as 0 under its |w| > 1e-15 guards)."""
    out = {}
    for layer in spec.layers:
        vals = []
        for loss_name in LOSS_NAMES:
            w = weights.get(loss_name, {}).get(layer, 0.0)
            vals.append(0.0 if w is None else float(w))
        out[layer] = np.float32(vals)
    return out


def scalars_to_arrays(params):
    """tv/p (and optional temporal) scalar weights as float32 scalars
    (powers live in the spec)."""
    out = {'tv': np.float32(params.get('tv', 1.0)),
           'p': np.float32(params.get('p', 1.0))}
    if params.get('temporal'):
        out['temporal'] = np.float32(params['temporal'])
    return out


def empty_norms(spec):
    """Fresh norm state: all (0, unset)."""
    vals = {k: np.float32(0.0) for k in spec.norm_keys}
    set_ = {k: np.bool_(False) for k in spec.norm_keys}
    return vals, set_


def make_objective(spec, precision, compute_dtype, use_pallas=False,
                   remat=False, block1_s2d=True, input_s2d=False):
    """Returns objective(params, x, content_feats, grams, layer_weights,
    scalars, norms_vals, norms_set) -> (loss, grad, (norms_vals', norms_set'),
    trace_tuple). Pure — safe to close over inside a larger jitted step.

    input_s2d: x (and temporal_target) arrive in the block-1 space-to-depth
    layout (engine/steps.py S2D_RESIDENT); the TV loss runs its s2d-domain
    form (ops/losses.tv_norm_s2d, bit-identical), p/temporal are
    permutation-invariant elementwise, and the gradient is returned in the
    same s2d layout."""

    def objective(params, x, content_feats, grams, layer_weights, scalars,
                  norms_vals, norms_set, temporal_target=None):
        bf16_feed = BF16_FEED and compute_dtype == jnp.bfloat16
        tap_dtype = (compute_dtype if (BF16_TAPS or bf16_feed)
                     and compute_dtype == jnp.bfloat16 else None)

        def f32_sumsq(t):
            """sum(t^2) accumulated in float32 without materializing an f32
            copy of t (the BF16_FEED reduction primitive)."""
            return jnp.einsum('...,...->', t, t,
                              preferred_element_type=jnp.float32)
        model = vgg19.VGG19Features(params, precision, compute_dtype,
                                    remat, block1_s2d, tap_dtype, input_s2d)
        feats, vjp = model.features_and_vjp(x, spec.layers)
        style_fold = STYLE_FOLD and (STYLE_FOLD != 'auto' or x.size // 3 >= STYLE_FOLD_MIN_PIXELS)
        loss = jnp.float32(0.0)
        trace = []
        diffs = {}
        new_vals = dict(norms_vals)
        new_set = dict(norms_set)

        def norm_of(key, fresh):
            """First-eval RMS caching: use the stored norm if set, else the
            freshly computed one; mark set either way (worker.py:253-254)."""
            value = jnp.where(norms_set[key], norms_vals[key], fresh)
            new_vals[key] = value
            new_set[key] = jnp.bool_(True)
            return value

        for layer, has_c, has_s, has_d in spec.branches:
            feat = feats[layer]
            size = jnp.float32(np.prod(feat.shape))
            w = layer_weights[layer]
            # Under BF16_FEED the per-layer cotangent accumulates natively
            # in the tap dtype (terms are scalar multiples of bf16 tensors);
            # otherwise in f32 with one cast at the end.
            diff = jnp.zeros_like(feat,
                                  dtype=feat.dtype if bf16_feed
                                  else jnp.float32)

            if has_c:
                cw = w[0]
                if bf16_feed:
                    # feat - content stays bf16 (the engine stores content
                    # features in the compute dtype under this flag; the
                    # astype is a no-op then, a safety net otherwise), the
                    # sum-of-squares accumulates f32, and the loss / both
                    # RMS traces follow by scalar algebra — no f32 tensor,
                    # no tap cast, no cast-backward copy.
                    c_diff = feat - content_feats[layer].astype(feat.dtype)
                    sq = f32_sumsq(c_diff)
                    fresh = (2.0 / size) * jnp.sqrt(sq / size)  # rms(c_grad)
                    cn = norm_of(layer + ':c', fresh)
                    c_loss = cw * (sq / size) / cn
                    trace.append(c_loss)
                    loss = loss + c_loss
                    scale = cw * (2.0 / size) / cn
                    trace.append(jnp.abs(scale) * jnp.sqrt(sq / size))
                    diff = diff + scale.astype(feat.dtype) * c_diff
                else:
                    c_diff = feat - content_feats[layer]
                    c_grad = (2.0 / size) * c_diff
                    cn = norm_of(layer + ':c', _rms(c_grad))
                    c_loss = cw * jnp.mean(jnp.square(c_diff)) / cn
                    trace.append(c_loss)
                    loss = loss + c_loss
                    term = cw * c_grad / cn
                    trace.append(_rms(term))
                    diff = diff + term

            if has_s:
                sw = w[1]
                # The tap may be in the block-1 space-to-depth layout (last
                # dim 4*c, models/vgg19.py BLOCK1_S2D); the style math only
                # needs rows of true-channel vectors, which any pixel
                # permutation provides.
                n = vgg19.layer_channels(layer)
                if bf16_feed:
                    # The STYLE_EINSUM contraction with the gradient matmul
                    # emitted directly in the tap dtype (the MXU still
                    # accumulates f32 internally). The unscaled product
                    # s_raw only ever appears behind f32 scalars, so the
                    # 2/(n^2*size), norm, and weight factors fold into ONE
                    # bf16 scalar multiply, and both RMS traces follow by
                    # scalar algebra from one f32-accumulated sum-of-squares
                    # — or, under STYLE_FOLD, into the (c, c) gram_diff
                    # itself, with rms(s_raw) derived from the Gram matrix
                    # (see the flag comment): no big-tensor multiply, no
                    # full-tensor sum-of-squares.
                    v = (feat if feat.shape[-1] == n
                         else feat.reshape(*feat.shape[:-1], -1, n))
                    gram = jnp.einsum(
                        '...c,...d->cd', v, v, precision=precision,
                        preferred_element_type=jnp.float32) / size
                    gram_diff = gram - grams[layer]
                    k = 2.0 / (jnp.float32(n * n) * size)
                    if style_fold:
                        rms_raw = jnp.sqrt(jnp.maximum(jnp.sum(
                            jnp.dot(gram_diff, gram_diff,
                                    precision='highest') * gram), 0.0))
                        sn = norm_of(layer + ':s', k * rms_raw)
                        s_loss = sw * jnp.mean(jnp.square(gram_diff)) / sn
                        trace.append(s_loss)
                        loss = loss + s_loss
                        scale = sw * k / sn
                        trace.append(jnp.abs(scale) * rms_raw)
                        s_term = jnp.einsum(
                            '...c,cd->...d', v,
                            (scale * gram_diff).astype(feat.dtype),
                            precision=precision,
                            preferred_element_type=feat.dtype)
                        diff = diff + s_term.reshape(feat.shape)
                    else:
                        s_raw = jnp.einsum(
                            '...c,cd->...d', v, gram_diff.astype(feat.dtype),
                            precision=precision,
                            preferred_element_type=feat.dtype)
                        s_raw = s_raw.reshape(feat.shape)
                        rms_raw = jnp.sqrt(f32_sumsq(s_raw) / size)
                        sn = norm_of(layer + ':s', k * rms_raw)
                        s_loss = sw * jnp.mean(jnp.square(gram_diff)) / sn
                        trace.append(s_loss)
                        loss = loss + s_loss
                        scale = sw * k / sn
                        trace.append(jnp.abs(scale) * rms_raw)
                        diff = diff + scale.astype(feat.dtype) * s_raw
                elif use_pallas and feat.shape[-1] == n:
                    # Fused Pallas kernel: Gram accumulation + G_diff +
                    # gradient matmul in one pass (ops/pallas).
                    from ..ops.pallas import fused_style_branch
                    s_grad, gram_diff = fused_style_branch(feat, grams[layer])
                elif STYLE_EINSUM and compute_dtype == jnp.bfloat16:
                    # Reshape-free form: contract over every non-channel
                    # axis of the (possibly s2d-blocked) tap. Same math,
                    # N-D output — XLA is free to lay the result out the
                    # way the conv backward consumes it.
                    v = (feat if feat.shape[-1] == n
                         else feat.reshape(*feat.shape[:-1], -1, n))
                    gram = jnp.einsum(
                        '...c,...d->cd', v, v, precision=precision,
                        preferred_element_type=jnp.float32) / size
                    gram_diff = gram - grams[layer]
                    s_grad = jnp.einsum(
                        '...c,cd->...d', v, gram_diff.astype(feat.dtype),
                        precision=precision,
                        preferred_element_type=jnp.float32)
                    s_grad = s_grad.reshape(feat.shape)
                    s_grad = s_grad * (2.0 / (jnp.float32(n * n) * size))
                else:
                    gram_diff = (gram_matrix(feat, precision, channels=n)
                                 - grams[layer])
                    flat = feat.reshape(-1, n)
                    # Reference half-gradient, NHWC form: feat @ gram_diff
                    # (gram_diff is symmetric), scaled by 2/(c^2 * c*h*w).
                    # gram_diff joins the matmul in the tap dtype: a
                    # mixed-dtype dot would silently promote the big
                    # operand to f32 (no-op when taps are f32).
                    s_grad = jnp.dot(flat, gram_diff.astype(feat.dtype),
                                     precision=precision,
                                     preferred_element_type=jnp.float32)
                    s_grad = s_grad.reshape(feat.shape)
                    s_grad = s_grad * (2.0 / (jnp.float32(n * n) * size))
                if not bf16_feed:
                    sn = norm_of(layer + ':s', _rms(s_grad))
                    s_loss = sw * jnp.mean(jnp.square(gram_diff)) / sn
                    trace.append(s_loss)
                    loss = loss + s_loss
                    term = (sw / sn) * s_grad
                    trace.append(_rms(term))
                    diff = diff + term

            if has_d:
                dw = w[2]
                if bf16_feed:
                    # d_grad = (-2/size)*feat: the same scalar-folded form.
                    rms_feat = jnp.sqrt(f32_sumsq(feat) / size)
                    fresh = (2.0 / size) * rms_feat
                    dn = norm_of(layer + ':d', fresh)
                    d_loss = -dw * jnp.square(rms_feat) / dn
                    trace.append(d_loss)
                    loss = loss + d_loss
                    scale = dw * (-2.0 / size) / dn
                    trace.append(jnp.abs(scale) * rms_feat)
                    diff = diff + scale.astype(feat.dtype) * feat
                else:
                    d_grad = (-2.0 / size) * feat
                    dn = norm_of(layer + ':d', _rms(d_grad))
                    d_loss = -dw * jnp.mean(jnp.square(feat)) / dn
                    trace.append(d_loss)
                    loss = loss + d_loss
                    term = dw * d_grad / dn
                    trace.append(_rms(term))
                    diff = diff + term

            # The cotangent enters the vjp in the tap dtype; the cast
            # fuses into the diff-accumulation epilogue (identity for
            # f32 taps).
            diffs[layer] = diff.astype(feat.dtype)

        trace.append(loss)  # scd_loss

        x_scaled = x / jnp.float32(255.0)
        if input_s2d:
            tv_loss, tv_grad = tv_norm_s2d(x_scaled, 3, spec.tv_power)
        else:
            tv_loss, tv_grad = tv_norm(x_scaled, spec.tv_power)
        t_loss = scalars['tv'] * tv_loss
        trace.append(t_loss)
        loss = loss + t_loss

        p_loss, p_grad = p_norm(x_scaled, spec.p_power)
        pl = scalars['p'] * p_loss
        trace.append(pl)
        loss = loss + pl

        if spec.temporal:
            # Video temporal consistency: true gradient of
            # tw * mean(((x - prev)/255)^2) w.r.t. x.
            t_diff = (x - temporal_target) / jnp.float32(255.0)
            tmp_loss = scalars['temporal'] * jnp.mean(jnp.square(t_diff))
            trace.append(tmp_loss)
            loss = loss + tmp_loss
            tmp_grad = scalars['temporal'] * (2.0 / (jnp.float32(x.size)
                                                     * 255.0)) * t_diff

        grad = vjp(diffs)
        trace.append(_rms(grad))  # scd_grad
        tv_term = scalars['tv'] * tv_grad
        trace.append(_rms(tv_term))  # t_grad
        grad = grad + tv_term
        p_term = scalars['p'] * p_grad
        trace.append(_rms(p_term))  # p_grad
        grad = grad + p_term

        if spec.temporal:
            trace.append(_rms(tmp_grad))  # temporal_grad
            grad = grad + tmp_grad

        trace.append(loss)        # loss
        trace.append(_rms(grad))  # grad

        return loss, grad, (new_vals, new_set), tuple(trace)

    return objective

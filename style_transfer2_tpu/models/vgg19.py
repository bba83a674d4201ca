"""Truncated VGG-19 feature extractor, TPU-native.

Replicates the behavior of the reference's Caffe network
(/root/reference/models/vgg19.prototxt + worker.py:32-106) as a pure
functional JAX program:

  * 16 conv layers (3x3, pad 1) + in-place ReLU, 5 max-pools (2x2, stride 2),
    no FC layers. Blob order: data, conv1_1, conv1_2, pool1, ..., pool5.
  * A feature tap at blob name "convX_Y" is the POST-ReLU activation (Caffe
    in-place ReLU overwrites the conv blob); "poolN" is the pool output;
    "data" is the preprocessed input itself.
  * Max pooling uses Caffe's ceil-mode output size (out = ceil(H/2)); odd
    trailing rows/cols are covered by a clipped window. Implemented with
    -inf padding so results match Caffe exactly.
  * Preprocessing matches worker.py:63-66: float32 RGB, subtract the mean
    (123.68, 116.779, 103.939) per channel, NO channel reversal (the
    reference's ``[::1]`` is a no-op slice, preserved deliberately).

Layout is NHWC throughout — channels on the TPU lane dimension so the MXU
tiles convs natively — with (1, H, W, 3) images; the reference's NCHW exists
only at the host API boundary.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pallas import conv as _pconv

# RGB channel means (reference worker.py:34).
MEAN_RGB = np.float32([123.68, 116.779, 103.939])

# Perf tunables, read at trace time. Both default OFF: the on-device A/B
# (512px bf16 L-BFGS scan, profiler-timed, v5e — docs/ROUND2.md) measured
# XLA's native path at 6.2 ms/step vs 6.8 with the conv1_1 space-to-depth
# rewrite and 6.6 with the argmax pooling vjp. The step's actual layout-copy
# overhead sits around the WHOLE block 1 (conv1_2's partitioned layouts),
# which neither of these touches — kept as measured baselines for the
# block-level rewrite.
S2D_CONV1 = False
POOL_ARGMAX_VJP = False

# Run the WHOLE first block (conv1_1 -> ReLU -> conv1_2 -> ReLU -> pool1) in
# the 2x2 space-to-depth domain: H/2 x W/2 spatial, 4x-stacked channels, with
# pool1 an elementwise max over the 4 sub-pixel blocks that lands directly on
# pool1's natural (H/2, W/2, 64) output. Never materializes a full-resolution
# 64-channel activation, which is what XLA spatially partitions and
# surrounds with layout copies (device-trace measured: block 1 was ~43% of
# the 512px bf16 step, half of it pure copies). Block-1 feature taps are
# returned in s2d layout — every loss is a pixel-permutation-invariant
# reduction, so consumers only need the true channel count (layer_channels).
# True  = on for bfloat16 at even H, W (the speed mode; float32 keeps the
#         reference-exact summation order). 'always' = also float32 (tests).
BLOCK1_S2D = True

# Fused Pallas conv3x3+bias+ReLU with the masked input-gradient backward
# (ops/pallas/conv.py) on the layers it supports (C_in >= 64, C_out a lane
# multiple, tileable <=300k-px grids); others keep XLA. bf16 only. ON:
# whole-step -12.8%/-19.0% at 512/1024px bf16; the 2048 regression led
# to conv.py's MAX_PIXELS cap (hw_round5_results step*_pconv rows).
PALLAS_CONV = True

# (name, out_channels) for each conv layer, in network order.
CONV_SPECS = (
    ('conv1_1', 64), ('conv1_2', 64),
    ('conv2_1', 128), ('conv2_2', 128),
    ('conv3_1', 256), ('conv3_2', 256), ('conv3_3', 256), ('conv3_4', 256),
    ('conv4_1', 512), ('conv4_2', 512), ('conv4_3', 512), ('conv4_4', 512),
    ('conv5_1', 512), ('conv5_2', 512), ('conv5_3', 512), ('conv5_4', 512),
)
CONV_NAMES = tuple(name for name, _ in CONV_SPECS)

# All blob names in forward order, as CaffeModel.layers() returns them
# (reference worker.py:73-75): the data blob, every conv blob, every pool blob.
BLOB_NAMES = ('data',)
for _block in range(1, 6):
    _n_convs = 2 if _block <= 2 else 4
    BLOB_NAMES = BLOB_NAMES + tuple(
        'conv%d_%d' % (_block, i) for i in range(1, _n_convs + 1))
    BLOB_NAMES = BLOB_NAMES + ('pool%d' % _block,)

# Input channel count for each conv layer.
_IN_CHANNELS = {}
_prev = 3
for _name, _out in CONV_SPECS:
    _IN_CHANNELS[_name] = _prev
    _prev = _out


def blob_index(name):
    """Position of a blob in forward order; raises ValueError if unknown."""
    return BLOB_NAMES.index(name)


def layer_channels(name):
    """True semantic channel count of a blob (a pool blob has its block's
    conv width), independent of any internal space-to-depth tap layout."""
    if name == 'data':
        return 3
    if name.startswith('conv'):
        return dict(CONV_SPECS)[name]
    return dict(CONV_SPECS)['conv%s_1' % name[4:]]


def preprocess(image):
    """HxWx3 (or 1xHxWx3) RGB uint8/float -> (1, H, W, 3) float32, mean
    subtracted. Matches reference worker.py:63-66 (RGB order preserved)."""
    arr = jnp.asarray(image, jnp.float32)
    if arr.ndim == 3:
        arr = arr[None]
    return arr - MEAN_RGB


def deprocess(image):
    """Inverse of preprocess: (1, H, W, 3) -> HxWx3 float32 RGB."""
    arr = jnp.asarray(image, jnp.float32)
    if arr.ndim == 4:
        arr = arr[0]
    return arr + MEAN_RGB


def _conv(x, w, b, precision):
    """3x3 pad-1 convolution + bias, NHWC/HWIO. Inputs and output share
    x's dtype (uniform dtypes keep the conv vjp well-typed; the MXU still
    accumulates float32 internally for bf16 inputs)."""
    y = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        precision=precision,
        preferred_element_type=x.dtype,
    )
    return y + b


@jax.custom_vjp
def _pool_2x2(x):
    """Max over the 2x2 sub-axes of an (n, h2, 2, w2, 2, c) array.

    The custom vjp replaces jnp.max's default machinery (equality mask +
    tie-count + divide + broadcast — ~4 full-size HBM passes, measured 16%
    of the 512px step) with a saved 2-bit argmax and ONE fused backward
    pass. Tie routing becomes first-max-wins, which is exactly Caffe's and
    torch's max-pool backward (the default jvp SPLITS gradient among ties
    instead — neither matches the reference's Caffe semantics better than
    this).

    Measured NOT a win (6.6 vs 6.2 ms/step, 512px bf16 v5e): XLA compiles
    the default max vjp into select_* convolution fusions that beat the
    saved-argmax + masked-scatter pair, so the flag stays off."""
    return jnp.max(x, axis=(2, 4))


def _pool_2x2_fwd(x):
    x00 = x[:, :, 0, :, 0, :]
    x01 = x[:, :, 0, :, 1, :]
    x10 = x[:, :, 1, :, 0, :]
    x11 = x[:, :, 1, :, 1, :]
    # >= keeps the earlier window position on ties (Caffe scan order).
    m0 = jnp.maximum(x00, x01)
    i0 = jnp.where(x00 >= x01, jnp.uint8(0), jnp.uint8(1))
    m1 = jnp.maximum(x10, x11)
    i1 = jnp.where(x10 >= x11, jnp.uint8(2), jnp.uint8(3))
    y = jnp.maximum(m0, m1)
    idx = jnp.where(m0 >= m1, i0, i1)
    return y, idx


def _pool_2x2_bwd(idx, g):
    code = jnp.arange(4, dtype=jnp.uint8).reshape(2, 2)
    mask = idx[:, :, None, :, None, :] == code[None, None, :, None, :, None]
    gx = jnp.where(mask, g[:, :, None, :, None, :], 0).astype(g.dtype)
    return (gx,)


_pool_2x2.defvjp(_pool_2x2_fwd, _pool_2x2_bwd)


def _max_pool_ceil(x):
    """2x2 stride-2 max pool with Caffe ceil-mode output size.

    Caffe computes out = ceil((H - k)/s) + 1 and clips the last window to the
    input; padding the bottom/right with -inf to 2*ceil(H/2) reproduces that
    exactly (max over the clipped window).

    Implemented as reshape + max over the 2x2 sub-axes rather than
    reduce_window: non-overlapping windows make them equivalent, and the
    reduce-max backward lowers to cheap elementwise fusions instead of
    select_and_scatter (measured ~1.6 ms/step of the 512px backward); the
    custom argmax vjp above cuts that further.
    """
    n, h, w, c = x.shape
    pad_h = -h % 2
    pad_w = -w % 2
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                    constant_values=-jnp.inf)
    h2, w2 = (h + pad_h) // 2, (w + pad_w) // 2
    x = x.reshape(n, h2, 2, w2, 2, c)
    if POOL_ARGMAX_VJP:
        return _pool_2x2(x)
    return jnp.max(x, axis=(2, 4))


def _s2d_kernel(w):
    """Expands a 3x3 SAME-padding kernel (3, 3, C_in, C_out) into the
    equivalent kernel (3, 3, 4*C_in, 4*C_out) over the 2x2 space-to-depth
    domain: a stride-1 conv over (H/2, W/2, 4*C_in) producing
    (H/2, W/2, 4*C_out) is the same linear map as the full-resolution conv.

    Index math: s2d input channel = (p*2 + q)*C_in + k for sub-pixel (p, q);
    output channel = (di*2 + dj)*C_out + c for output sub-pixel (di, dj);
    kernel tap (a, b) covers original offset u = 2a + p - di - 1 (same for
    v) — taps whose u/v fall outside the original 3x3 window are zero, so
    3/4 of the expanded kernel is structural zeros (4x nominal FLOPs for
    the same math). Worth it when the direct conv's channel count is
    MXU-hostile at full resolution (block 1); see BLOCK1_S2D."""
    cin, cout = w.shape[2], w.shape[3]
    # One contraction against a constant 0/1 selector (instead of a chain of
    # 36 scatter writes XLA fails to hoist out of the step scan): the
    # selector picks, per (tap, input block, output block), which original
    # tap lands there.
    sel = np.zeros((3, 3, 4, 4, 9), np.float32)
    for a in range(3):
        for b in range(3):
            for p in range(2):
                for q in range(2):
                    for di in range(2):
                        for dj in range(2):
                            u = 2 * a + p - di - 1
                            v = 2 * b + q - dj - 1
                            if 0 <= u < 3 and 0 <= v < 3:
                                sel[a, b, p * 2 + q, di * 2 + dj,
                                    u * 3 + v] = 1.0
    w9 = w.reshape(9, cin, cout)
    out = jnp.einsum('abPBk,kio->abPiBo', jnp.asarray(sel, w.dtype), w9)
    return out.reshape(3, 3, 4 * cin, 4 * cout)


# A third variant was measured and REJECTED: folding the space-to-depth
# transform into conv1_1 as a 5x5 stride-2 convolution applied directly to
# the full-resolution (n, H, W, 3) input. Forward was fine, but XLA lowers
# the BACKWARD (transposed strided conv producing the full-res 3-channel
# input gradient) to a 2.6 ms/step fusion — 7.3 ms/step total vs 5.4 for
# the materialized transform (512px bf16 v5e). The explicit
# _space_to_depth costs ~0.6 ms/step in both directions combined; the
# strided-conv backward costs 4x that.


# How the input's space-to-depth shuffle is expressed, A/B-measurable:
# 'slice'     — free W-merging reshape + two stride-2 H slices + concat
#               (channel order p*2c + q*c + k, identical to the transpose
#               form); keeps the shuffle off the lane dimension.
# 'transpose' — the direct 6-D reshape/transpose.
# Round-3 hardware A/B (bf16, tunneled v5e, on-device scan spans):
# 'slice' wins at every size — 4.75 vs 5.09 ms/step at 512px, 31.6 vs
# 32.9 at 1024, 144.9 vs 151.7 at 2048 (the 6-D transpose pays layout
# copies both directions: ~13 ms/step at 2048). Default: slice.
S2D_TRANSFORM = 'slice'

# How pool1 is computed in the space-to-depth domain (an elementwise max
# over the 4 sub-pixel channel blocks), A/B-measurable:
# 'reshape' — 5-D reshape + max(axis=3). Its vjp materializes eq-mask /
#             tie-count intermediates whose layouts the round-3 1024px
#             trace shows flipping H/W order vs the conv outputs
#             (vgg19.py:404/:357 copies, ~0.9 ms/step at 1024).
# 'slice'   — pairwise jnp.maximum over 4 channel slices: stays 4-D, the
#             vjp is fusable selects. Gradient routing differs from
#             'reshape' only on exact positive ties (measure-zero);
#             all-zero ReLU ties still split g/4 both ways.
# Hardware verdict (v5e bf16, on-device spans): 'slice' wins 7-8% at
# every size — 4.31 vs 4.64 ms/step at 512px, 20.9 vs 22.4 at 1024,
# 96.4 vs 105.0 at 2048 (tools/hw_round3_results.jsonl part 5).
S2D_POOL = 'slice'


def _space_to_depth(x):
    """(n, H, W, c) -> (n, H/2, W/2, 4*c), sub-pixel-major channel blocks
    (channel (p*2 + q)*c + k for row/col offsets p, q). Requires even
    H, W."""
    n, h, w, c = x.shape
    if S2D_TRANSFORM == 'slice':
        # Merge (w-pair, channel) into 2c lanes for free (row-major), then
        # split even/odd rows: channel = p*2c + (q*c + k) — the same
        # block-major order as the transpose form.
        xs = x.reshape(n, h, w // 2, 2 * c)
        return jnp.concatenate([xs[:, 0::2], xs[:, 1::2]], axis=-1)
    xs = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return xs.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)


def _depth_to_space(y, c):
    """Inverse of _space_to_depth: (n, H/2, W/2, 4*c) -> (n, H, W, c)."""
    n, h2, w2, _ = y.shape
    y = y.reshape(n, h2, w2, 2, 2, c)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h2, 2 * w2, c)


def _conv1_s2d(x, w, b, precision):
    """conv1_1 + bias via the space-to-depth rewrite, reshaped straight back
    to full resolution (the S2D_CONV1 variant; superseded by BLOCK1_S2D).

    Measured NOT a win by itself (6.8 vs 6.2 ms/step, 512px bf16 v5e): the
    immediate reshape back means conv1_2's partitioned-layout copies — the
    actual cost — remain."""
    xs = _space_to_depth(x)
    kernel = _s2d_kernel(w)
    y = jax.lax.conv_general_dilated(
        xs, kernel,
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        precision=precision,
        preferred_element_type=x.dtype,
    )
    y = y + jnp.tile(b, 4)
    return _depth_to_space(y, w.shape[3])


@functools.partial(jax.jit, static_argnames=('layers', 'precision',
                                             'compute_dtype', 'remat',
                                             'block1_s2d', 'tap_dtype',
                                             'input_s2d'))
def extract_features(params, x, layers=None, precision=jax.lax.Precision.HIGHEST,
                     compute_dtype=jnp.float32, remat=False,
                     block1_s2d=True, tap_dtype=None, input_s2d=False):
    """Runs the network forward, returning a dict of feature maps for the
    requested blob names (default: all blobs), like CaffeModel.forward
    (reference worker.py:77-86) — but stops at the deepest requested blob
    instead of always running the whole net.

    Args:
      params: dict conv_name -> {'w': (3,3,in,out) f32, 'b': (out,) f32}.
      x: preprocessed input, (1, H, W, 3) float32.
      layers: tuple of blob names to return (hashable/static).
      precision: matmul precision for float32 (HIGHEST = parity mode).
      compute_dtype: jnp.float32 for parity, jnp.bfloat16 for speed (the
        trunk runs in bf16 with f32 feature taps).
      remat: rematerialization policy for the backward pass.
        False      — save every activation (the fastest fit-in-memory mode).
        True/'conv' — checkpoint each conv+ReLU: the pre-activation values
        are recomputed, but every inter-conv activation is still saved as a
        checkpoint input, so residual memory only halves. Enables 2K+
        single-chip resolutions at ~1.5x backward FLOPs.
        'block'    — checkpoint whole conv blocks (conv_N_* .. pool_N): only
        the block boundaries (shrinking 4x per block) and the requested
        feature taps survive the forward pass, a several-fold further
        reduction at high res for the same recompute FLOPs as 'conv'.
      block1_s2d: caller-level gate on the block-1 space-to-depth path.
        The engine passes False under spatial sharding: the 6-D
        reshape/transpose across a sharded H axis can force cross-shard
        regrouping, and the 1.22x win was only ever measured single-chip
        (512px bf16). BLOCK1_S2D='always' overrides, for the hardware A/B.
      tap_dtype: dtype of the returned feature taps. None (default) =
        float32 (full-precision loss math). The objective passes the
        compute dtype in bf16 speed mode (engine/objective.py BF16_TAPS):
        the features are bf16 upstream anyway, so an f32 tap adds no
        information while doubling tap/Gram/cotangent HBM traffic.
      input_s2d: x is ALREADY in the block-1 space-to-depth layout
        (n, H/2, W/2, 12) — the s2d-resident iterate (engine/steps.py
        S2D_RESIDENT) keeps the optimization state in that layout across a
        fused scan so the per-step input shuffle (and its backward) is
        paid once per chunk instead of once per step. Requires the
        BLOCK1_S2D path (the caller gates); the 'data' blob cannot be
        tapped (its layout would change meaning).
    """
    if layers is None:
        layers = BLOB_NAMES
    wanted = frozenset(layers)
    unknown = wanted - set(BLOB_NAMES)
    if unknown:
        raise ValueError('Unknown blob names: %s' % sorted(unknown))
    deepest = max(blob_index(l) for l in layers) if layers else 0

    feats = {}
    if 'data' in wanted:
        if input_s2d:
            raise ValueError("the 'data' blob cannot be tapped from an "
                             "s2d-resident input")
        feats['data'] = x

    # The fused conv rides the same caller gate as block-1 s2d: the engine
    # passes block1_s2d=False under spatial sharding, where a pallas_call
    # inside a GSPMD-partitioned program is unmeasured (and Element-window
    # specs have no sharding rule) — sharded runs keep XLA's convs.
    use_pallas = (PALLAS_CONV and compute_dtype == jnp.bfloat16
                  and block1_s2d)

    def conv_block(h, w, b):
        if use_pallas and _pconv.supported(h.shape, w.shape):
            return _pconv.conv3x3_bias_relu(h, w, b)
        return jnp.maximum(_conv(h, w, b, precision), 0.0)

    def conv1_block(h, w, b):
        return jnp.maximum(_conv1_s2d(h, w, b, precision), 0.0)

    def s2d_conv_block(h, w, b):
        w4, b4 = _s2d_kernel(w), jnp.tile(b, 4)
        if use_pallas and _pconv.supported(h.shape, w4.shape):
            return _pconv.conv3x3_bias_relu(h, w4, b4)
        return jnp.maximum(_conv(h, w4, b4, precision), 0.0)

    per_conv_remat = remat is True or remat == 'conv'
    block_remat = remat == 'block'
    if per_conv_remat:
        conv_block = jax.checkpoint(conv_block)
        conv1_block = jax.checkpoint(conv1_block)
        s2d_conv_block = jax.checkpoint(s2d_conv_block)

    # For an s2d-resident input the ORIGINAL grid (2*H/2, 2*W/2) is even by
    # construction; x.shape here is already the halved s2d grid.
    even = input_s2d or (x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0)
    # The space-to-depth rewrite of the thin first conv alone (measured off).
    use_s2d = (S2D_CONV1 and compute_dtype == jnp.bfloat16 and even
               and not input_s2d)
    # The whole-block-1 space-to-depth path: bf16 (speed) mode at even
    # resolutions; float32 keeps the direct convs so the parity-mode
    # summation order is untouched ('always' forces it on, for tests).
    use_b1 = (BLOCK1_S2D and even and not use_s2d
              and (block1_s2d or BLOCK1_S2D == 'always')
              and (compute_dtype == jnp.bfloat16 or BLOCK1_S2D == 'always'))
    if input_s2d and not (use_b1 and deepest >= 1):
        raise ValueError('input_s2d requires the BLOCK1_S2D path '
                         '(bf16/even grid/block1_s2d on) and at least one '
                         'non-data tap')

    # In bf16 mode the trunk runs bf16 end-to-end (uniform dtypes keep the
    # conv vjp well-typed); feature taps are returned as float32 so the loss
    # math stays full precision.
    h = x.astype(compute_dtype)
    start = 1
    if use_b1 and deepest >= 1:
        b1_names = tuple(n for n in ('conv1_1', 'conv1_2', 'pool1')
                         if blob_index(n) <= deepest)
        b1_tapped = tuple(n for n in b1_names if n in wanted)

        def block1_segment(h):
            # Block 1 in the s2d domain. conv1_1/conv1_2 taps come out in
            # s2d layout (n, H/2, W/2, 256) — semantically a permutation of
            # the (n, H, W, 64) pixels, which every loss reduction is
            # invariant to (consumers use layer_channels for the true
            # channel count). pool1 is the elementwise max over the 4
            # sub-pixel blocks: exactly the 2x2 window max, already at
            # pool1's natural (n, H/2, W/2, 64).
            # The barrier pins the bf16 cast BEFORE the 6-D transform: XLA
            # otherwise commutes them and runs the lane-hostile shuffle at
            # f32 width (trace-measured 0.2 ms/step extra). An s2d-resident
            # input arrives pre-shuffled — no transform, no barrier.
            taps = {}
            if not input_s2d:
                h = jax.lax.optimization_barrier(h)
                h = _space_to_depth(h)
            for name in b1_names:
                if name == 'pool1':
                    nb, h2, w2, c4 = h.shape
                    c = c4 // 4
                    if S2D_POOL == 'slice':
                        h = jnp.maximum(
                            jnp.maximum(h[..., :c], h[..., c:2 * c]),
                            jnp.maximum(h[..., 2 * c:3 * c], h[..., 3 * c:]))
                    else:
                        h = h.reshape(nb, h2, w2, 4, c).max(axis=3)
                else:
                    p = params[name]
                    h = s2d_conv_block(h, p['w'].astype(compute_dtype),
                                       p['b'].astype(compute_dtype))
                if name in b1_tapped:
                    taps[name] = h.astype(tap_dtype or jnp.float32)
            return h, tuple(taps[n] for n in b1_tapped)

        if block_remat:
            block1_segment = jax.checkpoint(block1_segment)
        h, b1_taps = block1_segment(h)
        feats.update(zip(b1_tapped, b1_taps))
        start = blob_index('pool1') + 1

    def make_segment(names_seg):
        tapped = tuple(n for n in names_seg if n in wanted)

        def segment(h):
            taps = {}
            for name in names_seg:
                if name.startswith('conv'):
                    p = params[name]
                    block = conv1_block if (name == 'conv1_1' and use_s2d) \
                        else conv_block
                    # in-place ReLU: the tap is post-ReLU
                    h = block(h, p['w'].astype(compute_dtype),
                              p['b'].astype(compute_dtype))
                else:  # pool
                    h = _max_pool_ceil(h)
                if name in tapped:
                    taps[name] = h.astype(tap_dtype or jnp.float32)
            return h, tuple(taps[n] for n in tapped)

        return tapped, segment

    remaining = tuple(n for n in BLOB_NAMES[start:deepest + 1])
    if block_remat:
        # One checkpointed segment per conv block (ending at its pool):
        # only the pool-boundary activations — shrinking 4x per block —
        # and the requested taps survive the forward pass.
        segments, cur = [], []
        for name in remaining:
            cur.append(name)
            if name.startswith('pool'):
                segments.append(tuple(cur))
                cur = []
        if cur:
            segments.append(tuple(cur))
    else:
        segments = [remaining] if remaining else []
    for names_seg in segments:
        tapped, segment = make_segment(names_seg)
        if block_remat:
            segment = jax.checkpoint(segment)
        h, seg_taps = segment(h)
        feats.update(zip(tapped, seg_taps))
    return {name: feats[name] for name in layers}


class VGG19Features:
    """Convenience object wrapper over the functional core, playing the role
    of the reference's CaffeModel (worker.py:32-106)."""

    def __init__(self, params, precision=jax.lax.Precision.HIGHEST,
                 compute_dtype=jnp.float32, remat=False, block1_s2d=True,
                 tap_dtype=None, input_s2d=False):
        self.params = params
        self.precision = precision
        self.compute_dtype = compute_dtype
        self.remat = remat
        self.block1_s2d = block1_s2d
        self.tap_dtype = tap_dtype
        self.input_s2d = input_s2d

    def layers(self):
        """All blob names, like CaffeModel.layers()."""
        return list(BLOB_NAMES)

    def preprocess(self, image):
        return preprocess(image)

    def deprocess(self, image):
        return deprocess(image)

    def forward(self, x, layers=None):
        layers = tuple(layers) if layers is not None else BLOB_NAMES
        return extract_features(self.params, x, layers,
                                self.precision, self.compute_dtype,
                                self.remat, self.block1_s2d,
                                self.tap_dtype, self.input_s2d)

    def features_and_vjp(self, x, layers):
        """Returns (features dict, vjp function). The vjp over injected
        per-layer cotangents is the moral equivalent of CaffeModel.backward's
        sectioned backward pass (reference worker.py:88-106)."""
        layers = tuple(layers)

        def f(x_):
            feats = extract_features(self.params, x_, layers,
                                     self.precision, self.compute_dtype,
                                     self.remat, self.block1_s2d,
                                     self.tap_dtype, self.input_s2d)
            return tuple(feats[l] for l in layers)

        outs, vjp_fn = jax.vjp(f, x)
        feats = dict(zip(layers, outs))
        return feats, lambda diffs: vjp_fn(tuple(diffs[l] for l in layers))[0]

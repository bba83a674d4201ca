"""Analytic roofline model of one optimization step.

Predicts the speed-of-light step time per (size, precision, remat policy)
on a TPU chip: compute-bound time from analytic conv/matmul FLOPs (XLA's
compiled cost_analysis omits TPU conv custom calls, so it cannot be used
— see bench.py), memory-bound time from modeled HBM traffic, and the
roofline floor max(compute, memory). This is the denominator for the
measured per-size step-time/MFU table (VERDICT r2 #6): a measured step
near its floor is done; one far above it has layout/copy overhead worth
tracing (that's exactly how round 2 found the block-1 copies, which were
43% of the 512px step against a model that said block 1 should be ~15%).

Model assumptions (documented, deliberately simple):
  * Convs dominate: forward + input-gradient backward are each one
    9*Cin*Cout matmul per pixel (no weight gradients exist in this
    workload). Gram/style matmuls are included; elementwise work
    (ReLU, pooling, TV/content losses, the optimizer two-loop) is
    counted as HBM traffic only — it fuses into neighbors on TPU.
  * HBM traffic: each conv reads its input and writes its output;
    the backward reads the output cotangent, the saved (or recomputed)
    activation for the ReLU mask, and writes the input cotangent.
    Residuals: with remat off, every conv output is written in the
    forward and read in the backward; 'conv' remat saves every conv
    INPUT (recomputing conv+ReLU in the backward, +1x forward FLOPs);
    'block' remat saves only block inputs (pool boundaries, shrinking
    4x per block) and recomputes the block forward once inside the
    backward (+1x forward FLOPs, and the recompute's intra-block
    traffic is counted).
  * Weights traffic is counted once per pass (they are tiny next to
    activations at every size this framework serves).
  * Entries whose whole working set fits in VMEM can beat the HBM
    roofline — flagged in the table rather than special-cased.

Peak numbers are per-chip; f32 conv throughput on TPU uses bf16x3-style
multi-pass MXU execution, modeled as 1/3 of bf16 peak (the measured
whole-step f32/bf16 ratio is smaller, ~2.2x at 512px, because the f32
step is partially memory-bound — which this model reproduces).
"""

from dataclasses import dataclass

from ..models.vgg19 import BLOB_NAMES, CONV_SPECS, blob_index, layer_channels

_IN_CHANNELS = {}
_prev = 3
for _name, _out in CONV_SPECS:
    _IN_CHANNELS[_name] = _prev
    _prev = _out

CHIPS = {
    'v5e': dict(bf16_flops=197.3e12, f32_flops=197.3e12 / 3,
                hbm_gbs=819e9, vmem_bytes=128 * 2 ** 20,
                ici_gbs=45e9, ici_latency=1e-6),
    'v5p': dict(bf16_flops=459e12, f32_flops=459e12 / 3,
                hbm_gbs=2765e9, vmem_bytes=128 * 2 ** 20,
                ici_gbs=90e9, ici_latency=1e-6),
    'v6e': dict(bf16_flops=918e12, f32_flops=918e12 / 3,
                hbm_gbs=1640e9, vmem_bytes=128 * 2 ** 20,
                ici_gbs=45e9, ici_latency=1e-6),
}

# float32_fast: f32 HBM traffic, but matmul inputs rounded to bf16 for
# single-pass MXU (Precision.DEFAULT) — bf16 peak FLOPs with f32 bytes.
DTYPE_BYTES = {'float32': 4, 'float32_fast': 4, 'bfloat16': 2}

MXU_TILE = 128


def mxu_efficiency(k, n):
    """Fraction of MXU peak a (M huge, K=k, N=n) matmul can reach: the
    systolic array processes 128x128 tiles, so channel-poor dimensions
    waste lanes (conv1_1 is K=9*3=27, N=64 -> ~10% of peak — exactly why
    the block-1 space-to-depth rewrite pays: it trades pixels for
    channels). M (pixels) is always large here and modeled as full."""
    eff_k = k / (MXU_TILE * -(-k // MXU_TILE))
    eff_n = n / (MXU_TILE * -(-n // MXU_TILE))
    return eff_k * eff_n

# The benchmark objective's taps (bench.py WEIGHTS): deepest is conv5_1.
DEFAULT_CONTENT = ('conv4_2',)
DEFAULT_STYLE = ('conv1_1', 'conv2_1', 'conv3_1', 'conv4_1', 'conv5_1')


@dataclass
class StepModel:
    flops: float          # MXU FLOPs of one optimizer step
    peak_flops: float     # chip peak at this precision
    hbm_bytes: float      # modeled HBM traffic of one step
    t_compute: float      # s, tile-aware sum of FLOPs / (peak * mxu_eff)
    t_memory: float       # s, bytes / bandwidth
    t_floor: float        # s, max of the two
    bound: str            # 'compute' | 'memory'
    fits_vmem: bool       # peak single-layer working set < VMEM

    def mfu_at(self, step_seconds):
        """Raw model-FLOPs utilization of chip peak (ignores tiling)."""
        return self.flops / self.peak_flops / step_seconds

    def sol_at(self, step_seconds):
        """Fraction of the ROOFLINE floor (1.0 = speed of light)."""
        return self.t_floor / step_seconds


def _grid_walk(hw):
    """Yields (blob, h, w, c_in, c_out) for convs and (blob, h, w, c) for
    pools, tracking the Caffe ceil-pool grid."""
    h, w = hw
    for name in BLOB_NAMES[1:]:
        if name.startswith('conv'):
            yield name, h, w, _IN_CHANNELS[name], dict(CONV_SPECS)[name]
        else:
            c = dict(CONV_SPECS)['conv%s_1' % name[4]]
            yield name, h, w, c, c
            h, w = -(-h // 2), -(-w // 2)


def model_step(hw, precision='bfloat16', remat=False, chip='v5e',
               content_layers=DEFAULT_CONTENT, style_layers=DEFAULT_STYLE):
    """Builds the roofline StepModel for one optimizer step."""
    spec = CHIPS[chip]
    b = DTYPE_BYTES[precision]
    peak = spec['f32_flops' if precision == 'float32' else 'bf16_flops']
    deepest = max(blob_index(l) for l in
                  tuple(content_layers) + tuple(style_layers))

    flops = 0.0
    mxu_seconds = 0.0   # tile-aware: channel-poor layers run below peak
    hbm = 0.0
    max_working = 0

    passes_fwd = 2 if remat else 1   # forward + backward recompute
    for name, h, w, c_in, c_out in _grid_walk(hw):
        if blob_index(name) > deepest:
            break
        pix = h * w
        if name.startswith('conv'):
            conv_flops = 2.0 * pix * 9 * c_in * c_out
            flops += conv_flops * (passes_fwd + 1)   # fwd(s) + input-grad
            # fwd: K=9*c_in, N=c_out; input-grad: K=9*c_out, N=c_in.
            mxu_seconds += (passes_fwd * conv_flops
                            / (peak * mxu_efficiency(9 * c_in, c_out)))
            mxu_seconds += (conv_flops
                            / (peak * mxu_efficiency(9 * c_out, c_in)))
            w_bytes = 9 * c_in * c_out * b
            act_in, act_out = pix * c_in * b, pix * c_out * b
            # forward pass(es): read in, read weights, write out.
            hbm += passes_fwd * (act_in + w_bytes + act_out)
            # backward: read cotangent + ReLU activation, read weights,
            # write input cotangent.
            hbm += 2 * act_out + w_bytes + act_in
            # residual save/load between fwd and bwd:
            if not remat:
                pass          # act_out already counted both sides
            elif remat == 'conv':
                hbm += 2 * act_in          # save + reload each conv input
            max_working = max(max_working, act_in + act_out + w_bytes)
        else:   # pool: fwd read+write, bwd read+write (mask via recompute)
            act = h * w * c_in * b
            hbm += passes_fwd * (act + act // 4) + (act // 4 + act)
            if remat == 'block':
                hbm += 2 * (act // 4)      # block boundary save + reload

    # Gram + style-gradient matmuls, on post-pool tap grids.
    feat_hw = {'data': hw}
    hh, ww = hw
    for name in BLOB_NAMES[1:]:
        if name.startswith('pool'):
            hh, ww = -(-hh // 2), -(-ww // 2)
        feat_hw[name] = (hh, ww)
    for layer in style_layers:
        hh, ww = feat_hw[layer]
        c = layer_channels(layer)
        gram_flops = 2 * 2.0 * hh * ww * c * c   # gram + grad matmuls
        flops += gram_flops
        mxu_seconds += gram_flops / (peak * mxu_efficiency(c, c))
        hbm += 2 * (hh * ww * c * b) + 2 * c * c * b

    # Host-visible step state (iterate in/out, optimizer history): ~10
    # HWx3 arrays for the L-BFGS two-loop at n_corr=10.
    hbm += 24 * hw[0] * hw[1] * 3 * b

    t_c = mxu_seconds
    t_m = hbm / spec['hbm_gbs']
    return StepModel(flops=flops, peak_flops=peak, hbm_bytes=hbm,
                     t_compute=t_c, t_memory=t_m,
                     t_floor=max(t_c, t_m),
                     bound='compute' if t_c >= t_m else 'memory',
                     fits_vmem=max_working < spec['vmem_bytes'])


# -- spatially-sharded (multi-chip) extension (VERDICT r4 #7) ----------------
#
# parallel/spatial.py H-shards the iterate over an n-way 'space' mesh axis
# and lets GSPMD place the collectives. Their analytic cost on a 1-D ICI
# ring, per step:
#
#   * halo exchanges — every 3x3 conv reads 1 row from each H-neighbor:
#     each device receives 2 rows of (W, C_in) per forward conv and 2 rows
#     of (W, C_out) of cotangent per input-gradient conv (+1 more forward
#     per conv under remat's recompute). Halos sit on the layer dependency
#     chain (conv N+1 cannot start before its boundary rows arrive), so
#     their time is additive, not overlapped: bytes/ici_gbs + a per-
#     exchange ICI latency. Pools are non-overlapping 2x2 — no halo while
#     the per-device H stays even (snap_hw guarantees the iterate; deep
#     odd levels replicate and are modeled shard-free).
#   * Gram psum — the (C, C) style Gram becomes local matmul + one
#     all-reduce of C*C f32 per style layer (forward), and its gradient
#     uses the replicated G_diff (no further comm). Ring all-reduce moves
#     2*(n-1)/n * bytes per link: resolution-independent, latency-leaning.
#   * scalar psums — the per-step loss/trace reduction: one fused
#     all-reduce of ~a cache line; pure latency, counted once.
#
# ici_gbs is the one-way per-link bandwidth (v5e ~45 GB/s/direction per
# neighbor on a torus axis); ici_latency a per-collective constant. Both
# are order-of-magnitude calibration knobs: the model's job is the SHAPE
# of the sharded regime (where halo cost crosses compute savings, how the
# floor scales with n), to be calibrated against real ICI when available.


@dataclass
class ShardedStepModel:
    n_shards: int
    per_chip: StepModel    # per-device compute/memory floors (1/n work)
    t_ici: float           # s, halo + psum time on the critical path
    halo_bytes: float      # per-device bytes received per step
    n_collectives: int     # latency-bearing exchanges per step
    t_floor: float         # s, max(compute, memory) + ici
    bound: str             # 'compute' | 'memory' | 'ici'

    def sol_at(self, step_seconds):
        return self.t_floor / step_seconds


def model_step_sharded(hw, n_shards, precision='bfloat16', remat='block',
                       chip='v5e', content_layers=DEFAULT_CONTENT,
                       style_layers=DEFAULT_STYLE):
    """Roofline for one H-sharded step on an n-way 1-D mesh.

    Per-device compute/memory scale the single-chip model by 1/n on the
    H axis (layers whose per-device H would vanish — the deep pyramid —
    replicate in practice, but carry negligible work at the sizes this
    regime serves, so uniform scaling is kept). ICI terms per the module
    notes above."""
    spec = CHIPS[chip]
    b = DTYPE_BYTES[precision]
    deepest = max(blob_index(l) for l in
                  tuple(content_layers) + tuple(style_layers))

    # Per-device floors: the single-chip walk at (H/n, W) reproduces the
    # 1/n pixel scaling exactly (every conv/pool/Gram term is linear in H;
    # ceil-pool rounding differs immaterially at sharded-regime sizes).
    h, w = hw
    per_hw = (max(1, h // n_shards), w)
    per_chip = model_step(per_hw, precision, remat, chip,
                          content_layers, style_layers)

    passes_fwd = 2 if remat else 1
    halo_bytes = 0.0
    n_coll = 0
    if n_shards > 1:
        for name, hh, ww, c_in, c_out in _grid_walk(hw):
            if blob_index(name) > deepest:
                break
            if not name.startswith('conv'):
                continue
            # Layers whose grid no longer shards (per-device H < 2 rows)
            # replicate: no halo, no comm.
            if hh // n_shards < 2:
                continue
            row = ww * b
            halo_bytes += 2 * row * (passes_fwd * c_in + c_out)
            n_coll += 2 * (passes_fwd + 1)
        for layer in style_layers:
            c = layer_channels(layer)
            halo_bytes += 2.0 * (n_shards - 1) / n_shards * c * c * 4
            n_coll += 2 * (n_shards - 1)
        n_coll += 2 * (n_shards - 1)   # the fused scalar/trace psum

    t_ici = halo_bytes / spec['ici_gbs'] + n_coll * spec['ici_latency']
    t_local = max(per_chip.t_compute, per_chip.t_memory)
    t_floor = t_local + t_ici
    bound = per_chip.bound if t_local >= t_ici else 'ici'
    return ShardedStepModel(n_shards=n_shards, per_chip=per_chip,
                            t_ici=t_ici, halo_bytes=halo_bytes,
                            n_collectives=n_coll, t_floor=t_floor,
                            bound=bound)

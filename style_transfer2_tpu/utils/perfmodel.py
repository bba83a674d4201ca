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
                hbm_gbs=819e9, vmem_bytes=128 * 2 ** 20),
    'v5p': dict(bf16_flops=459e12, f32_flops=459e12 / 3,
                hbm_gbs=2765e9, vmem_bytes=128 * 2 ** 20),
    'v6e': dict(bf16_flops=918e12, f32_flops=918e12 / 3,
                hbm_gbs=1640e9, vmem_bytes=128 * 2 ** 20),
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

#!/usr/bin/env python3
"""On-device step-time measurement (the round-2 methodology, in-repo).

Times the fused K-step scan from a jax.profiler trace — the duration of
the jit_scan_fn span on the device track — NOT wall clock, which over the
tunnel includes ~0.5 s dispatch latency and time-sharing noise
(CLAUDE.md: measure via profiler on-device scan spans). Prints one JSON
line so sweeps are scriptable.

Each configuration should run in a FRESH process: the s2d/transform flags
are read at trace time and the jit cache would otherwise serve a stale
program for the same static key.

Examples (the pending round-3 sweeps):
  # S2D_TRANSFORM A/B at 512px bf16:
  python tools/measure_step.py --s2d-transform transpose
  python tools/measure_step.py --s2d-transform slice
  # high-res regime traces (keep the trace dir for MFU analysis):
  python tools/measure_step.py --size 1024 --remat --keep-trace /tmp/t1024
  python tools/measure_step.py --size 2048 --remat --chunk 20 \\
      --keep-trace /tmp/t2048
  # sharded-s2d A/B (once multi-chip exists):
  python tools/measure_step.py --mesh 4 --block1-s2d on|off
"""

import argparse
import glob
import gzip
import json
import shutil
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

WEIGHTS = {'content': {'conv4_2': 0.08},
           'style': {'conv1_1': 1.0, 'conv2_1': 1.0, 'conv3_1': 1.0,
                     'conv4_1': 1.0},
           'deepdream': {}}
SCALARS = {'p': 50.0, 'p_power': 6.0, 'tv': 5.0, 'tv_power': 2.0}


def device_scan_ms(trace_dir, k, span_prefix='jit_scan_fn'):
    """Longest-span duration (ms/step) of the fused scan on the DEVICE
    track of the newest trace in trace_dir. The device track is found by
    process name (/device:TPU:* or the CPU PJRT device), not a hardcoded
    pid."""
    path = sorted(glob.glob(
        str(Path(trace_dir) / 'plugins/profile/*/*.trace.json.gz')))[-1]
    events = json.load(gzip.open(path))['traceEvents']
    device_pids = {
        e['pid'] for e in events
        if e.get('ph') == 'M' and e.get('name') == 'process_name'
        and '/device:' in str(e.get('args', {}).get('name', ''))}
    spans = [e['dur'] for e in events
             if e.get('ph') == 'X' and e.get('pid') in device_pids
             and str(e.get('name', '')).startswith(span_prefix)]
    if not spans:
        return None
    return max(spans) / 1000.0 / k


def device_op_summary(trace_dir, top_k=15):
    """Aggregate device-track op durations by name from the newest trace:
    [(name, total_ms, share), ...] for the top_k ops. The decision-grade
    view for 'what dominates the step at this size' (the round-2 method
    that found block 1 = 43% of the 512px step, run automatically)."""
    path = sorted(glob.glob(
        str(Path(trace_dir) / 'plugins/profile/*/*.trace.json.gz')))[-1]
    events = json.load(gzip.open(path))['traceEvents']
    device_pids = {
        e['pid'] for e in events
        if e.get('ph') == 'M' and e.get('name') == 'process_name'
        and '/device:' in str(e.get('args', {}).get('name', ''))}
    # Leaf op events only: skip the scan-level wrapper spans so shares sum
    # over actual kernels, not nested totals.
    totals = {}
    for e in events:
        if e.get('ph') != 'X' or e.get('pid') not in device_pids:
            continue
        name = str(e.get('name', ''))
        if name.startswith('jit_'):
            continue
        totals[name] = totals.get(name, 0) + e['dur']
    grand = sum(totals.values())
    if not grand:
        return []
    top = sorted(totals.items(), key=lambda kv: -kv[1])[:top_k]
    return [{'op': name, 'ms': round(dur / 1000.0, 2),
             'share': round(dur / grand, 3)} for name, dur in top]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--size', type=int, default=512)
    p.add_argument('--chunk', type=int, default=60, help='fused steps/dispatch')
    p.add_argument('--reps', type=int, default=3, help='best-of repetitions')
    p.add_argument('--precision', default='bfloat16')
    p.add_argument('--optimizer', default='lbfgs')
    p.add_argument('--remat', nargs='?', const='conv', default=False,
                   choices=('conv', 'block'))
    p.add_argument('--pallas', action='store_true',
                   help='fused Pallas style kernel (TPU; regime search '
                        'for VERDICT r2 weak #7)')
    p.add_argument('--mesh', default='', help="spatial mesh (e.g. '4')")
    p.add_argument('--block1-s2d', choices=('auto', 'on', 'off'),
                   default='auto')
    p.add_argument('--s2d-transform', choices=('transpose', 'slice'),
                   default=None, help='override vgg19.S2D_TRANSFORM')
    p.add_argument('--s2d-pool', choices=('reshape', 'slice'),
                   default=None, help='override vgg19.S2D_POOL')
    # Tri-state flag overrides (--x / --no-x / absent = module default):
    # both modules ship non-False defaults now, so a plain store_true could
    # never measure the OFF arm and would mislabel the default run.
    p.add_argument('--bf16-taps', action=argparse.BooleanOptionalAction,
                   default=None,
                   help='objective.BF16_TAPS: taps in compute dtype')
    p.add_argument('--style-einsum', action=argparse.BooleanOptionalAction,
                   default=None,
                   help='objective.STYLE_EINSUM: reshape-free style '
                        'contraction')
    p.add_argument('--bf16-feed', action=argparse.BooleanOptionalAction,
                   default=None,
                   help='objective.BF16_FEED: fully bf16-native loss feed '
                        '(taps, content feats, cotangents in bf16; '
                        'f32-accumulating reductions)')
    p.add_argument('--s2d-resident', action=argparse.BooleanOptionalAction,
                   default=None,
                   help='steps.S2D_RESIDENT: iterate + optimizer state stay '
                        'in s2d layout across the fused scan chunk')
    p.add_argument('--bf16-history', action=argparse.BooleanOptionalAction,
                   default=None,
                   help='lbfgs.BF16_HISTORY: curvature pairs stored bf16 '
                        '(bf16 mode only; dots still accumulate f32)')
    p.add_argument('--style-fold', action=argparse.BooleanOptionalAction,
                   default=None,
                   help='objective.STYLE_FOLD: style scale folded into '
                        'gram_diff, rms(s_raw) derived in the Gram domain '
                        '(bf16_feed branch only)')
    p.add_argument('--pallas-conv', action=argparse.BooleanOptionalAction,
                   default=None,
                   help='vgg19.PALLAS_CONV: fused Pallas conv3x3+bias+ReLU '
                        'with masked input-gradient backward (bf16 only)')
    p.add_argument('--platform', default='')
    p.add_argument('--keep-trace', default='',
                   help='keep the profiler trace at this directory')
    args = p.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update('jax_platforms', args.platform)
    jax.config.update('jax_compilation_cache_dir', str(ROOT / '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from style_transfer2_tpu.models import vgg19
    if args.s2d_transform:
        vgg19.S2D_TRANSFORM = args.s2d_transform
    if args.s2d_pool:
        vgg19.S2D_POOL = args.s2d_pool
    if args.pallas_conv is not None:
        vgg19.PALLAS_CONV = args.pallas_conv
    from style_transfer2_tpu.engine import objective as _objective
    if args.bf16_taps is not None:
        _objective.BF16_TAPS = args.bf16_taps
    if args.style_einsum is not None:
        _objective.STYLE_EINSUM = args.style_einsum
    if args.bf16_feed is not None:
        _objective.BF16_FEED = args.bf16_feed
    if args.style_fold is not None:
        _objective.STYLE_FOLD = args.style_fold
    from style_transfer2_tpu.engine import steps as _steps
    if args.s2d_resident is not None:
        _steps.S2D_RESIDENT = args.s2d_resident
    from style_transfer2_tpu.optim import lbfgs as _lbfgs
    if args.bf16_history is not None:
        _lbfgs.BF16_HISTORY = args.bf16_history

    import numpy as np
    from PIL import Image
    from style_transfer2_tpu.engine import StyleTransfer
    from style_transfer2_tpu.models import random_params
    from style_transfer2_tpu.utils import resize_to_fit

    placement = None
    if args.mesh:
        from style_transfer2_tpu.parallel import SpatialPlacement, make_mesh
        placement = SpatialPlacement(
            make_mesh(args.mesh, axis_names=('space',)))

    content = np.uint8(resize_to_fit(Image.open(
        ROOT / 'examples/golden_gate.jpg').convert('RGB'), args.size))
    style = np.uint8(resize_to_fit(Image.open(
        ROOT / 'examples/starry_night.jpg').convert('RGB'), args.size))
    if placement is not None:
        hw = placement.snap_hw(content.shape[:2])
        content = np.uint8(np.asarray(Image.fromarray(content).resize(
            hw[::-1], Image.LANCZOS)))

    b1 = {'auto': None, 'on': True, 'off': False}[args.block1_s2d]
    st = StyleTransfer(random_params(0), precision=args.precision,
                      placement=placement, remat=args.remat, block1_s2d=b1,
                      use_pallas=args.pallas)
    st.set_weights(WEIGHTS, SCALARS)
    st.set_optimizer(args.optimizer)
    st.set_step_size(1.0 if args.optimizer == 'lbfgs' else 10.0)
    st.set_content(content)
    st.set_style(style)
    st.set_input(np.random.RandomState(0).uniform(
        0, 255, content.shape).astype(np.uint8))
    assert st.start()

    t0 = time.perf_counter()
    st.run_steps(args.chunk, fetch_image=False)   # compile + warm
    warm_s = time.perf_counter() - t0

    tdir = args.keep_trace or '/tmp/measure_step_trace'
    best_ms = None
    wall = []
    for _ in range(args.reps):
        if not args.keep_trace:
            shutil.rmtree(tdir, ignore_errors=True)
        t0 = time.perf_counter()
        with jax.profiler.trace(tdir):
            st.run_steps(args.chunk, fetch_image=False)
        wall.append(time.perf_counter() - t0)
        ms = device_scan_ms(tdir, args.chunk)
        if ms is not None and (best_ms is None or ms < best_ms):
            best_ms = ms

    loss = float(st.traces[-1].data['loss'])
    assert np.isfinite(loss)
    # HBM peak (per-device; populated on TPU, absent on the CPU backend) —
    # the deciding number for the remat-policy A/B.
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        peak_mb = round(stats.get('peak_bytes_in_use', 0) / 2**20)
    except Exception:
        peak_mb = None
    ops = None
    if args.keep_trace:
        try:
            ops = device_op_summary(tdir)
        except Exception:
            ops = None
    # Roofline context: the measured step as a fraction of the analytic
    # speed-of-light floor (tools/perf_model.py prints the full table).
    floor_ms = sol_pct = None
    try:
        from style_transfer2_tpu.utils.perfmodel import model_step
        spec = st.spec()
        m = model_step(st.input_hw, args.precision, remat=args.remat,
                       content_layers=spec.content_layers,
                       style_layers=spec.style_layers)
        floor_ms = round(m.t_floor * 1e3, 3)
        if best_ms is not None:
            sol_pct = round(100 * m.sol_at(best_ms / 1e3), 1)
    except Exception:
        pass
    print(json.dumps({
        'hbm_peak_mb': peak_mb or None,
        'top_ops': ops,
        'size': args.size, 'precision': args.precision,
        'chunk': args.chunk, 'remat': args.remat, 'mesh': args.mesh,
        'block1_s2d': args.block1_s2d, 'pallas': args.pallas,
        's2d_transform': args.s2d_transform or vgg19.S2D_TRANSFORM,
        's2d_pool': args.s2d_pool or vgg19.S2D_POOL,
        # Effective module values (post-override), not the raw CLI args —
        # the JSON must describe what actually ran.
        'bf16_taps': _objective.BF16_TAPS,
        'style_einsum': _objective.STYLE_EINSUM,
        'bf16_feed': _objective.BF16_FEED,
        'style_fold': _objective.STYLE_FOLD,
        's2d_resident': _steps.S2D_RESIDENT,
        'bf16_history': _lbfgs.BF16_HISTORY,
        'pallas_conv': getattr(vgg19, 'PALLAS_CONV', False),
        'device_ms_per_step': None if best_ms is None else round(best_ms, 3),
        'roofline_floor_ms': floor_ms, 'pct_of_sol': sol_pct,
        'wall_best_its_per_s': round(args.chunk / min(wall), 2),
        'warmup_s': round(warm_s, 1), 'loss': loss,
    }), flush=True)
    return 0


if __name__ == '__main__':
    sys.exit(main())

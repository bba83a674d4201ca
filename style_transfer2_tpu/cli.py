#!/usr/bin/env python3
"""Command-line style transfer: the headless counterpart of the web app.

Reproduces the benchmark configurations end-to-end (BASELINE.json):
single-scale runs (config 1), the multi-scale coarse-to-fine schedule with
warm-started optimizer state (config 2 — the automated version of the
reference's user-paced resolution ladder, using the sqrt(2) scales() ladder
the reference shipped but never wired up, utils.py:193-207), spatial
sharding for high resolutions (config 4), checkpoint/resume, and a Trace
CSV dump compatible with StyleTransfer.write_trace (worker.py:312-315).

Example:
  python -m style_transfer2_tpu.cli content.jpg style.jpg -o out.png \\
      --size 1024 --multi-scale --iterations 150 --trace-csv trace.csv
"""

import argparse
import logging
import sys
import time
from pathlib import Path

import numpy as np
import yaml
from PIL import Image

from . import utils
from .utils import images as im

logger = logging.getLogger('cli')

ROOT_DIR = Path(__file__).resolve().parents[1]


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument('content', help='content image path')
    p.add_argument('style', help='style image path')
    p.add_argument('--output', '-o', default='out.png', help='output image path')
    p.add_argument('--size', type=int, default=512,
                   help='output size (largest dimension)')
    p.add_argument('--style-size', type=int, default=None,
                   help='style image size (defaults to --size)')
    p.add_argument('--iterations', '-i', type=int, default=200,
                   help='iterations (per scale when --multi-scale)')
    p.add_argument('--optimizer', choices=('adam', 'lbfgs'), default='lbfgs')
    p.add_argument('--step-size', type=float, default=None,
                   help='optimizer step size (defaults: adam 10, lbfgs 1)')
    p.add_argument('--weights', default=None,
                   help='loss-weights YAML (initial_weights.yaml format)')
    p.add_argument('--model-weights', default='auto',
                   help="VGG-19 weights: 'auto', 'random', or a path "
                        '(.npz / .caffemodel)')
    p.add_argument('--multi-scale', action='store_true',
                   help='coarse-to-fine: optimize up the sqrt(2) size ladder '
                        'with warm-started optimizer state')
    p.add_argument('--min-scale', type=int, default=96,
                   help='smallest rung of the multi-scale ladder')
    p.add_argument('--prewarm-ladder', action='store_true',
                   help='compile the next ladder rung in the background '
                        'while the current rung optimizes (cuts wall-clock '
                        'where compiles are slow, e.g. a tunneled backend)')
    p.add_argument('--batch', action='store_true',
                   help='content is a directory (or glob): style every '
                        'image, batched as lanes of ONE vmapped program '
                        '(--output becomes a directory)')
    p.add_argument('--lanes', type=int, default=4,
                   help='concurrent images per dispatch in --batch mode')
    p.add_argument('--skip-existing', action='store_true',
                   help='--batch: skip inputs whose styled output already '
                        'exists, so an interrupted batch restarts where '
                        'it died (images are independent jobs)')
    p.add_argument('--data-mesh', default='',
                   help="shard --batch lanes over a 'data' mesh "
                        "('auto', or a device count)")
    p.add_argument('--init', choices=('random', 'content'), default='random',
                   help='initial iterate')
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--precision',
                   choices=('float32', 'float32_fast', 'bfloat16'),
                   default='float32',
                   help='float32 = reference-exact parity; float32_fast = '
                        'f32 state with single-pass MXU matmuls; bfloat16 = '
                        'the speed mode')
    p.add_argument('--platform', default='',
                   help="override the JAX platform (e.g. 'cpu')")
    p.add_argument('--mesh', default='',
                   help="spatial sharding mesh for high-res (e.g. '4' or "
                        "'auto'); empty = single device")
    p.add_argument('--steps-per-dispatch', type=int, default=60,
                   help='iterations fused per device dispatch')
    p.add_argument('--pipeline-depth', type=int, default=2,
                   help='fused chunks in flight at once (consecutive '
                        'dispatches chain on device, so a chunk\'s collect '
                        'round trip overlaps the next chunk\'s compute — '
                        'the serving driver\'s dispatch discipline); 1 = '
                        'synchronous')
    p.add_argument('--polish', type=int, default=0, metavar='N',
                   help='after the main run, refine with N iterations at '
                        '--polish-precision, warm-started from the final '
                        'iterate (recovers the bfloat16 quality delta — '
                        'measured +2%%/+4.6%% final loss at 512/1024px — at '
                        'a fraction of a full-precision run)')
    p.add_argument('--polish-precision',
                   choices=('float32', 'float32_fast'),
                   default='float32',
                   help='precision of the --polish phase. float32 (default) '
                        '= reference-exact parity math: the round-5 hardware '
                        'arms measured it recovering 87%% of the bf16 '
                        'quality gap in 1.7 s at 512px, where float32_fast '
                        'recovered only 8%% (its single-pass matmul noise '
                        'floor is the same order as the bf16 delta itself '
                        '- tools/hw_round5_results.jsonl polish_*_v2)')
    p.add_argument('--trace-csv', default=None, help='write the trace here')
    p.add_argument('--checkpoint', default=None,
                   help='save a resumable checkpoint directory at the end')
    p.add_argument('--resume', default=None,
                   help='resume from a checkpoint directory')
    p.add_argument('--save-every', type=int, default=0,
                   help='write the in-progress image every N iterations')
    # Round-3 hardware: remat is 22-30% SLOWER at 1024/2048/2560px bf16
    # (activations fit 16 GB HBM through 2560px — the whole bf16
    # single-chip envelope, since 3072px OOMs even WITH block remat).
    # In bf16 remat has no winning single-chip regime; reach for it
    # under float32 at high res or when sharding leaves a tight shard.
    p.add_argument('--remat', nargs='?', const='conv', default=False,
                   choices=('conv', 'block'),
                   help='rematerialize in the backward pass (less memory, '
                        '~1.5x backward compute). "conv" (the bare-flag '
                        'default) checkpoints each conv, for 2K+ sizes; '
                        '"block" checkpoints whole conv blocks — only pool '
                        'boundaries survive the forward, for 3K+/4K sizes')
    p.add_argument('--pallas', action='store_true',
                   help='use the fused Pallas style kernel (TPU)')
    p.add_argument('--profile', default=None,
                   help='capture a jax.profiler trace into this directory')
    p.add_argument('--debug', '-d', action='count', default=0)
    return p.parse_args(argv)


def load_weights_doc(path):
    if path is None:
        path = ROOT_DIR / 'initial_weights.yaml'
    with open(path) as f:
        doc = yaml.safe_load(f)
    return doc[0], doc[1]


IMAGE_SUFFIXES = ('.png', '.jpg', '.jpeg', '.webp', '.bmp')


def run_batch(args):
    """Batch mode: every content image under `content` is styled against
    one style image, with images as lanes of one vmapped program — the
    TPU-native throughput shape (N jobs share each fused dispatch and the
    lane axis shards over a 'data' mesh), vs. the reference's one-process-
    per-job serial loop. Images group by their fitted grid so nothing is
    distorted; each distinct grid compiles once and its images process in
    lane-sized waves."""
    import jax
    from .engine.batched import BatchedStyleTransfer
    from .models.weights import resolve_params

    src = Path(args.content)
    if src.is_dir():
        paths = sorted(p for p in src.iterdir()
                       if p.suffix.lower() in IMAGE_SUFFIXES)
    else:
        import glob
        paths = [Path(p) for p in sorted(glob.glob(args.content))]
    if not paths:
        raise SystemExit('--batch: no images match %r' % args.content)
    outdir = Path(args.output)
    if outdir.suffix:
        raise SystemExit('--batch: --output must be a directory')
    outdir.mkdir(parents=True, exist_ok=True)
    if args.multi_scale or args.mesh:
        raise SystemExit('--batch does not combine with --multi-scale or '
                         'the spatial --mesh (use --data-mesh)')
    if args.skip_existing:
        def styled_ok(p):
            """A half-written PNG (the run died mid-save) is NOT done —
            verify() catches truncation without a full decode."""
            out = outdir / (p.stem + '_styled.png')
            if not out.exists():
                return False
            try:
                with Image.open(out) as img:
                    img.verify()
                return True
            except Exception:
                logger.warning('--skip-existing: %s is corrupt; redoing',
                               out.name)
                return False
        todo = [p for p in paths if not styled_ok(p)]
        if len(todo) < len(paths):
            logger.info('--skip-existing: %d of %d already styled',
                        len(paths) - len(todo), len(paths))
        paths = todo
        if not paths:
            logger.info('--skip-existing: nothing to do')
            return 0

    placement = None
    if args.data_mesh:
        from .parallel import DataPlacement, make_mesh
        mesh = make_mesh(args.data_mesh, axis_names=('data',))
        placement = DataPlacement(mesh)
        if args.lanes % mesh.devices.size:
            raise SystemExit('--lanes (%d) must divide by the data mesh '
                             '(%d devices)' % (args.lanes,
                                               mesh.devices.size))
        logger.info('lane axis sharded over %d devices', mesh.devices.size)

    params = resolve_params(args.model_weights, ROOT_DIR)
    weights, scalar_params = load_weights_doc(args.weights)
    style_pil = Image.open(args.style).convert('RGB')
    style_np = np.uint8(im.resize_to_fit(style_pil,
                                         args.style_size or args.size))
    rng = np.random.RandomState(args.seed)

    groups = {}
    for path in paths:
        with Image.open(path) as img:
            wh = im.fit_into_square(img.size, args.size, scale_up=True)
        groups.setdefault((wh[1], wh[0]), []).append(path)
    logger.info('%d images in %d grid group(s): %s', len(paths),
                len(groups), {hw: len(g) for hw, g in groups.items()})

    total_t0 = time.perf_counter()
    n_done = 0
    for hw, group in sorted(groups.items()):
        engine = BatchedStyleTransfer(
            params, weights, scalar_params, hw, max_lanes=args.lanes,
            optimizer=args.optimizer, precision=args.precision,
            placement=placement)
        for wave_start in range(0, len(group), args.lanes):
            wave = group[wave_start:wave_start + args.lanes]
            lanes = {}
            for path in wave:
                content = np.uint8(Image.open(path).convert('RGB')
                                   .resize(hw[::-1], Image.LANCZOS))
                init = (content if args.init == 'content' else
                        rng.uniform(0, 255, hw + (3,)).astype(np.uint8))
                lane = engine.add_job(content, style_np, init,
                                      step_size=args.step_size)
                engine.set_running(lane, True)
                lanes[lane] = path
            # Chunks dispatch --pipeline-depth deep (begin_steps_all chains
            # on device): a chunk's collect round trip overlaps the next
            # chunk's compute, like the single-image loop.
            from collections import deque
            t0 = time.perf_counter()
            remaining = args.iterations
            depth = max(1, args.pipeline_depth)
            handles = deque()
            while remaining > 0 or handles:
                while remaining > 0 and len(handles) < depth:
                    chunk = min(args.steps_per_dispatch, remaining)
                    handles.append(engine.begin_steps_all(chunk))
                    remaining -= chunk
                traces = engine.collect_steps_all(handles.popleft())
            dt = time.perf_counter() - t0
            for lane, path in lanes.items():
                out = outdir / (path.stem + '_styled.png')
                im.as_pil(engine.lane_image(lane)).save(out)
                logger.info('%s -> %s (loss %.6g)', path.name, out,
                            traces[lane][-1]['loss'])
                engine.remove_job(lane)
            n_done += len(wave)
            logger.info('wave of %d at %dx%d: %d iters in %.2fs '
                        '(%.2f aggregate it/s)', len(wave), hw[0], hw[1],
                        args.iterations, dt,
                        len(wave) * args.iterations / dt)
    logger.info('styled %d images in %.1fs', n_done,
                time.perf_counter() - total_t0)
    return 0


def main(argv=None):
    args = parse_args(argv)
    utils.setup_logging(args.debug)

    if args.platform:
        import jax
        jax.config.update('jax_platforms', args.platform)
    import jax
    jax.config.update('jax_compilation_cache_dir',
                      str(ROOT_DIR / '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    if args.batch:
        logger.info('devices: %s', jax.devices())
        return run_batch(args)

    from .engine import StyleTransfer
    from .engine.checkpoint import load_checkpoint, save_checkpoint
    from .models.weights import resolve_params

    logger.info('devices: %s', jax.devices())

    placement = None
    if args.mesh:
        from .parallel import SpatialPlacement, make_mesh
        mesh = make_mesh(args.mesh, axis_names=('space',))
        placement = SpatialPlacement(mesh, axis='space')
        logger.info('spatial sharding over %d devices', mesh.devices.size)

    params = resolve_params(args.model_weights, ROOT_DIR)
    weights, scalar_params = load_weights_doc(args.weights)

    st = StyleTransfer(params, precision=args.precision, placement=placement,
                       use_pallas=args.pallas, remat=args.remat)
    st.set_weights(weights, scalar_params)
    st.set_optimizer(args.optimizer)
    st.set_step_size(args.step_size if args.step_size is not None
                     else {'adam': 10.0, 'lbfgs': 1.0}[args.optimizer])

    content_pil = Image.open(args.content).convert('RGB')
    style_pil = Image.open(args.style).convert('RGB')
    style_size = args.style_size or args.size
    style_np = np.uint8(im.resize_to_fit(style_pil, style_size))
    st.set_style(style_np)

    rng = np.random.RandomState(args.seed)

    target_wh = im.fit_into_square(content_pil.size, args.size, scale_up=True)
    target_hw = (target_wh[1], target_wh[0])
    if args.multi_scale:
        ladder = im.scales(target_hw, min_size=args.min_scale)
    else:
        ladder = [target_hw]
    if placement is not None:
        # Snap every rung to a mesh-divisible grid: an awkward-aspect 4K
        # job would otherwise silently replicate (the one regime spatial
        # sharding exists for). The content squashes by < one shard worth
        # of pixels.
        snapped = []
        for hw in ladder:
            s = placement.snap_hw(hw)
            if s != hw:
                logger.info('snapped %dx%d -> %dx%d for the %d-way mesh',
                            *hw, *s, placement.n_shards)
            if s not in snapped:
                snapped.append(s)
        ladder = snapped

    if args.resume:
        load_checkpoint(st, args.resume)
        logger.info('resumed from %s at iterate %d, %dx%d', args.resume,
                    st.t, *st.input_hw)
        # Continue the ladder from the restored resolution upward.
        ladder = [hw for hw in ladder if hw > st.input_hw] or []

    profile_ctx = None
    if args.profile:
        jax.profiler.start_trace(args.profile)
        profile_ctx = args.profile

    def dispatch_chunks():
        """The distinct fused chunk lengths one rung's loop dispatches
        (fetch_image is host-side; the length alone keys the program)."""
        ks, remaining = set(), args.iterations
        while remaining > 0:
            chunk = min(args.steps_per_dispatch, remaining)
            if args.save_every:
                chunk = min(chunk, args.save_every)
            ks.add(chunk)
            remaining -= chunk
        return sorted(ks)

    def start_prewarm(next_hw):
        """Compiles rung next_hw's programs on a throwaway engine in a
        background thread while the current rung optimizes (the engine
        builders/executables are shared caches, so the live engine's first
        dispatch at next_hw then reuses them)."""
        import threading

        def work():
            try:
                dt = st.prewarm(next_hw, ks=dispatch_chunks())
                logger.info('prewarmed %dx%d in %.1fs', *next_hw, dt)
            except Exception:
                logger.warning('prewarm of %s failed', next_hw, exc_info=True)
        thread = threading.Thread(target=work, name='prewarm', daemon=True)
        thread.start()
        return thread

    total_t0 = time.perf_counter()
    first = not args.resume
    image = st.snapshot() if args.resume else None
    for rung, hw in enumerate(ladder):
        content = np.uint8(content_pil.resize((hw[1], hw[0]), Image.LANCZOS))
        if first:
            st.set_content(content)
            if args.init == 'random':
                init_img = rng.uniform(0, 255, hw + (3,)).astype(np.uint8)
            else:
                init_img = content
            st.set_input(init_img)
            first = False
        else:
            # Warm start: resample iterate + optimizer state up the ladder
            # (the reference's resolution-change path, worker.py:154-160).
            st.resample_input(hw)
            st.set_content(content)
        assert st.start(), 'engine failed to start (inconsistent state?)'

        prewarm_thread = None
        if args.prewarm_ladder and rung + 1 < len(ladder):
            prewarm_thread = start_prewarm(ladder[rung + 1])

        # Chunks dispatch --pipeline-depth deep: begin_steps chains on
        # device, so each collect's link round trip overlaps the next
        # chunk's compute (the chunk plan is fixed up front — no trace
        # feedback steers it, unlike the serving tuner).
        from collections import deque
        remaining = args.iterations
        depth = max(1, args.pipeline_depth)
        handles = deque()
        t0 = time.perf_counter()
        while remaining > 0 or handles:
            while remaining > 0 and len(handles) < depth:
                chunk = min(args.steps_per_dispatch, remaining)
                if args.save_every:
                    chunk = min(chunk, args.save_every)
                handles.append((chunk, st.begin_steps(chunk)))
                remaining -= chunk
            chunk, handle = handles.popleft()
            image, traces = st.collect_steps(
                handle, fetch_image=bool(args.save_every))
            trace = traces[-1].data
            if args.save_every and (handle.t_end % args.save_every) < chunk:
                im.as_pil(image).save(args.output)
            logger.info('scale %dx%d iterate %d loss %.6g', hw[0], hw[1],
                        handle.t_end, trace['loss'])
        dt = time.perf_counter() - t0
        logger.info('scale %dx%d: %d iters in %.2fs (%.2f it/s)',
                    hw[0], hw[1], args.iterations, dt, args.iterations / dt)
        if prewarm_thread is not None:
            # Join before the next rung dispatches so a still-compiling
            # prewarm doesn't race the live engine into a duplicate compile
            # of the same program.
            prewarm_thread.join()

    # Polish only ever RAISES precision (the serving tiers share this
    # gate via PRECISION_RANK): --precision float32 with the default
    # --polish-precision float32_fast would silently DOWNGRADE the
    # reference-exact result.
    from .serve.session import PRECISION_RANK
    polish_raises = (PRECISION_RANK.get(args.polish_precision, -1)
                     > PRECISION_RANK.get(args.precision, 99))
    if args.polish and polish_raises:
        # Polish phase: refine the result with full-precision iterations,
        # warm-started from the final iterate (snapshot -> preprocess is a
        # lossless mean-shift round trip; the optimizer re-primes at the
        # polish precision). The polish engine's first trace row is the
        # f32-evaluated loss of the main run's result — the bf16 quality
        # delta the phase exists to recover.
        logger.info('polish: %d iterations at %s', args.polish,
                    args.polish_precision)
        stp = StyleTransfer(params, precision=args.polish_precision,
                            placement=placement, use_pallas=args.pallas,
                            remat=args.remat)
        stp.set_weights(weights, scalar_params)
        stp.set_optimizer(args.optimizer)
        stp.set_step_size(args.step_size if args.step_size is not None
                          else {'adam': 10.0, 'lbfgs': 1.0}[args.optimizer])
        stp.set_style(style_np)
        hw_final = st.input_hw
        stp.set_content(np.uint8(content_pil.resize(
            (hw_final[1], hw_final[0]), Image.LANCZOS)))
        stp.set_input(st.snapshot())
        # Inherit the main run's first-eval gradient-RMS norms: the polish
        # is a CONTINUATION of the same optimization at higher precision,
        # so it must optimize the same normalized objective. Without this
        # the polish engine's first evaluation re-anchors the norms at the
        # (converged) main-run iterate — small gradients there inflate the
        # per-layer weights and the tail optimizes a different objective
        # than the one the main run minimized (reference semantics: norms
        # persist across everything but reset, worker.py:137,172-175).
        stp.norm_vals.update(
            {k: np.float32(v) for k, v in st.norm_vals.items()})
        stp.norm_set.update(
            {k: np.bool_(bool(v)) for k, v in st.norm_set.items()})
        assert stp.start(), 'polish engine failed to start'
        from collections import deque
        depth = max(1, args.pipeline_depth)
        remaining = args.polish
        handles = deque()
        t0 = time.perf_counter()
        while remaining > 0 or handles:
            while remaining > 0 and len(handles) < depth:
                chunk = min(args.steps_per_dispatch, remaining)
                handles.append((chunk, stp.begin_steps(chunk)))
                remaining -= chunk
            chunk, handle = handles.popleft()
            _, traces = stp.collect_steps(handle, fetch_image=False)
            logger.info('polish iterate %d loss %.6g', handle.t_end,
                        traces[-1].data['loss'])
        logger.info('polish: %d iters in %.2fs', args.polish,
                    time.perf_counter() - t0)
        if args.trace_csv:
            # The main run's trace goes to --trace-csv (written here, while
            # st is still the main engine); the polish engine's own trace —
            # whose first row is the full-precision evaluation of the main
            # result — goes alongside it.
            st.write_trace(args.trace_csv)
            logger.info('wrote %s', args.trace_csv)
            polish_csv = str(Path(args.trace_csv).with_suffix('')) \
                + '.polish.csv'
            stp.write_trace(polish_csv)
            logger.info('wrote %s', polish_csv)
            args.trace_csv = None
        total_iterations = st.t + stp.t
        st = stp
    elif args.polish:
        total_iterations = st.t
        logger.info('polish skipped: --polish-precision %s does not raise '
                    '--precision %s', args.polish_precision, args.precision)
    else:
        total_iterations = st.t

    image = st.snapshot()
    im.as_pil(image).save(args.output)
    logger.info('wrote %s after %d iterations in %.1fs', args.output,
                total_iterations, time.perf_counter() - total_t0)

    if profile_ctx:
        jax.profiler.stop_trace()
        logger.info('profiler trace written to %s', profile_ctx)

    if args.trace_csv:
        st.write_trace(args.trace_csv)
        logger.info('wrote %s', args.trace_csv)

    if args.checkpoint:
        save_checkpoint(st, args.checkpoint)
        logger.info('checkpoint saved to %s', args.checkpoint)
    return 0


if __name__ == '__main__':
    sys.exit(main())

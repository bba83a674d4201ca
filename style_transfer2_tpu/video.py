#!/usr/bin/env python3
"""Video style transfer: per-frame warm-started optimization with a
temporal-consistency loss (BASELINE.json config 5).

Each frame re-uses the previous frame's stylized result twice: as the warm
initialization of the iterate (so far fewer iterations converge) and as the
target of a temporal-consistency term tw * mean(((x - prev)/255)^2) added to
the objective (engine/objective.py), which suppresses frame-to-frame
flicker. The first frame runs a full optimization from random init.

Frame I/O is a directory of numbered images in, a directory of PNGs out
(no ffmpeg dependency in this environment).

Example:
  python -m style_transfer2_tpu.video frames/ style.jpg out/ \\
      --size 512 --first-iterations 150 --iterations 40 --temporal 1000
"""

import argparse
import logging
import sys
import time
from pathlib import Path

import numpy as np
from PIL import Image

from . import utils
from .utils import images as im

logger = logging.getLogger('video')

ROOT_DIR = Path(__file__).resolve().parents[1]

IMAGE_EXTS = ('.png', '.jpg', '.jpeg', '.bmp', '.webp')


class VideoStylizer:
    """Drives a StyleTransfer engine across a frame sequence.

    The hot path is PIPELINED (round-4; the round-3 serial loop measured
    2.4 s/frame at 512px bf16 over the tunnel, dominated by host PNG I/O
    and two dispatch round-trips per frame):

      * one fused scan dispatch per frame (not steps_per_dispatch-sized
        pieces — video has no mid-run control to stay responsive to);
      * the previous frame's stylized result chains ON DEVICE into the next
        frame's warm start and temporal target (clip -> preprocess happen
        as enqueued device ops on the async scan output — no host
        round-trip in the dependency chain);
      * begin_frame enqueues everything and returns immediately; the host
        then collects the PREVIOUS frame's pixels and writes its PNG while
        the device crunches the current frame (collect_frame);
      * the temporal-loss programs (a different objective structure than
        frame 1's) compile in the BACKGROUND during frame 1's optimization
        via the prewarm machinery, so frame 2 doesn't stall on a compile.

    stylize_frame() remains as the simple serial API (used by tests)."""

    def __init__(self, params, weights, scalar_params, optimizer='lbfgs',
                 step_size=None, first_iterations=150, iterations=40,
                 temporal_weight=1000.0, precision='float32', seed=0,
                 steps_per_dispatch=20, use_pallas=False):
        from .engine import StyleTransfer
        self.st = StyleTransfer(params, precision=precision,
                                use_pallas=use_pallas)
        self.st.set_weights(weights, scalar_params)
        self.st.set_optimizer(optimizer)
        self.st.set_step_size(step_size if step_size is not None
                              else {'adam': 10.0, 'lbfgs': 1.0}[optimizer])
        self.first_iterations = first_iterations
        self.iterations = iterations
        self.temporal_weight = float(temporal_weight)
        self.steps_per_dispatch = steps_per_dispatch
        self.rng = np.random.RandomState(seed)
        self.prev_stylized = None
        self._prev_pre = None    # device (1, H, W, 3) PREPROCESSED prev frame
        self._prewarm_thread = None
        self._prepare = None     # fused clip+preprocess, jitted lazily

    def set_style(self, style_image):
        self.st.set_style(style_image)

    def prewarm_temporal(self, hw):
        """Compiles the temporal-objective programs (eval + frame-sized
        scan) on a background thread — call right after dispatching frame 1
        so frame 2 starts stepping immediately."""
        import threading
        st = self.st

        def work():
            try:
                st.prewarm(tuple(hw), ks=(self.iterations,),
                           scalar_overrides={'temporal': self.temporal_weight})
            except Exception:
                logger.exception('temporal prewarm failed (non-fatal)')

        self._prewarm_thread = threading.Thread(target=work, daemon=True)
        self._prewarm_thread.start()

    def begin_frame(self, frame):
        """Enqueues the full stylization of one HxWx3 uint8 frame WITHOUT
        blocking: content upload + feature forward, warm start + temporal
        target from the (possibly still in-flight) previous frame, and the
        fused scan. Returns a handle for collect_frame; handles must be
        collected in order."""
        st = self.st
        first = self._prev_pre is None
        st.set_content(frame)
        if first:
            init = self.rng.uniform(0, 255, frame.shape).astype(np.uint8)
            st.set_input(init)
            n = self.first_iterations
        else:
            pre, pre_copy = self._prev_pre
            st.set_input(pre, preprocessed=True)
            st.set_temporal(pre_copy, self.temporal_weight,
                            preprocessed=True)
            n = self.iterations
        st.is_starting = True
        st._start()
        assert st.is_running, 'engine failed to start'
        dispatch = st.begin_steps(n)
        # The next frame's warm start + temporal target, as ONE fused
        # device program on the async scan output (clip to [0,255] like
        # the serial path's host-side clip, then mean-subtract). The two
        # outputs are the same VALUE in distinct BUFFERS (the explicit
        # copy HLO): the warm start is donated into the next scan while
        # the target rides its non-donated inputs, and XLA rejects one
        # buffer appearing on both sides.
        self._prev_pre = self._prepare_fn()(dispatch.image)
        return dispatch

    def _prepare_fn(self):
        if self._prepare is None:
            import jax
            import jax.numpy as jnp
            from .models import vgg19

            def prep(img):
                pre = vgg19.preprocess(jnp.clip(img, 0, 255))
                return pre, jnp.copy(pre)

            self._prepare = jax.jit(prep)
        return self._prepare

    def seed_from(self, stylized_image):
        """Resume support: seeds the warm-start/temporal chain from a
        previously STYLIZED frame (the last PNG an interrupted run wrote),
        as if it had just been collected — the next begin_frame takes the
        temporal branch. The PNG round trip costs uint8 quantization of
        the float iterate (<= half a pixel level), well under the
        frame-to-frame motion the temporal loss absorbs."""
        self._prev_pre = self._prepare_fn()(
            np.ascontiguousarray(stylized_image, np.float32))
        self.prev_stylized = np.float32(stylized_image)

    def collect_frame(self, dispatch):
        """Blocks on a begin_frame handle; returns (stylized HxWx3 float32
        array, last trace dict)."""
        image, traces = self.st.collect_steps(dispatch, fetch_image=True)
        self.prev_stylized = image
        return image, traces[-1].data

    def collect_frames(self, dispatches):
        """Blocks on several begin_frame handles with ONE host round trip
        (StyleTransfer.collect_steps_many): over a tunneled backend the
        per-collect link RTT is the steady-state floor, so the pipelined
        driver collects frames in batches — three per transfer in main().
        Returns [(image, trace), ...]."""
        results = self.st.collect_steps_many(dispatches, fetch_image=True)
        out = []
        for image, traces in results:
            self.prev_stylized = image
            out.append((image, traces[-1].data))
        return out

    def stylize_frame(self, frame):
        """Serial API: stylizes one frame and blocks for its result."""
        return self.collect_frame(self.begin_frame(frame))


def list_frames(path):
    path = Path(path)
    frames = sorted(p for p in path.iterdir()
                    if p.suffix.lower() in IMAGE_EXTS)
    if not frames:
        raise FileNotFoundError('no frames found under %s' % path)
    return frames


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument('frames', help='directory of input frames')
    p.add_argument('style', help='style image path')
    p.add_argument('output', help='output directory')
    p.add_argument('--size', type=int, default=512)
    p.add_argument('--style-size', type=int, default=None)
    p.add_argument('--first-iterations', type=int, default=150,
                   help='iterations for the first frame')
    p.add_argument('--iterations', '-i', type=int, default=40,
                   help='iterations per subsequent frame')
    p.add_argument('--temporal', type=float, default=1000.0,
                   help='temporal-consistency loss weight')
    p.add_argument('--optimizer', choices=('adam', 'lbfgs'), default='lbfgs')
    p.add_argument('--step-size', type=float, default=None)
    p.add_argument('--weights', default=None,
                   help='loss-weights YAML (initial_weights.yaml format)')
    p.add_argument('--model-weights', default='auto')
    p.add_argument('--precision',
                   choices=('float32', 'float32_fast', 'bfloat16'),
                   default='float32')
    p.add_argument('--platform', default='')
    p.add_argument('--steps-per-dispatch', type=int, default=20)
    p.add_argument('--resume', action='store_true',
                   help='skip frames whose stylized output already exists '
                        '(contiguous prefix) and continue the temporal '
                        'chain from the last written frame — an '
                        'interrupted run restarts where it died instead '
                        'of at frame 1')
    p.add_argument('--pallas', action='store_true')
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--debug', '-d', action='count', default=0)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    utils.setup_logging(args.debug)

    if args.platform:
        import jax
        jax.config.update('jax_platforms', args.platform)
    import jax
    jax.config.update('jax_compilation_cache_dir', str(ROOT_DIR / '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from .cli import load_weights_doc
    from .models.weights import resolve_params

    params = resolve_params(args.model_weights, ROOT_DIR)
    weights, scalar_params = load_weights_doc(args.weights)

    stylizer = VideoStylizer(
        params, weights, scalar_params, optimizer=args.optimizer,
        step_size=args.step_size, first_iterations=args.first_iterations,
        iterations=args.iterations, temporal_weight=args.temporal,
        precision=args.precision, seed=args.seed,
        steps_per_dispatch=args.steps_per_dispatch, use_pallas=args.pallas)

    style = np.uint8(im.resize_to_fit(
        Image.open(args.style).convert('RGB'), args.style_size or args.size))
    stylizer.set_style(style)

    out_dir = Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)
    frames = list_frames(args.frames)
    logger.info('%d frames -> %s', len(frames), out_dir)

    def load_frame(path, size_wh):
        img = Image.open(path).convert('RGB')
        if size_wh is None:
            size_wh = im.fit_into_square(img.size, args.size, scale_up=True)
        return np.uint8(img.resize(size_wh, Image.LANCZOS)), size_wh

    # Pipelined loop: later frames' device work is enqueued before earlier
    # frames' pixels are fetched, so PNG encode/write and frame loads
    # overlap device compute — and frames COLLECT IN TRIPLES through one
    # host transfer (collect_frames), since over a tunneled backend the
    # per-collect link round trip is the steady-state floor.
    size_wh = None
    start_idx = 0
    if args.resume:
        # Contiguous prefix of existing outputs = already done; the chain
        # reseeds from the last one (a gap would break the temporal chain,
        # so only the prefix counts).
        while (start_idx < len(frames) and
               (out_dir / ('%s_stylized.png'
                           % frames[start_idx].stem)).exists()):
            start_idx += 1
        prev = None
        while start_idx:
            # The interruption --resume recovers from can leave the LAST
            # file half-written: walk back until one actually loads.
            last = out_dir / ('%s_stylized.png' % frames[start_idx - 1].stem)
            try:
                with Image.open(last) as img:
                    prev = np.uint8(img.convert('RGB'))
                break
            except Exception:
                logger.warning('resume: %s is corrupt; redoing it',
                               last.name)
                start_idx -= 1
        if start_idx:
            size_wh = (prev.shape[1], prev.shape[0])
            stylizer.seed_from(prev)
            logger.info('resume: %d frame(s) already stylized; chain '
                        'reseeded from %s', start_idx, last.name)
        if start_idx >= len(frames):
            logger.info('resume: all %d frames already stylized',
                        len(frames))
            return 0

    t0 = time.perf_counter()
    t_first = None
    pending = []  # (dispatch, out_path, index)
    collect_batch = 3

    def drain(batch):
        nonlocal t_first
        results = stylizer.collect_frames([d for d, _, _ in batch])
        for (d, path0, i0), (image, trace) in zip(batch, results):
            im.as_pil(image).save(path0)
            logger.info('frame %d/%d -> %s (loss %.5g)', i0 + 1,
                        len(frames), path0.name, trace['loss'])
            if i0 == 0:
                t_first = time.perf_counter() - t0

    for idx, frame_path in enumerate(frames):
        if idx < start_idx:
            continue
        frame, size_wh = load_frame(frame_path, size_wh)
        dispatch = stylizer.begin_frame(frame)
        if idx == 0 and len(frames) > 1:
            # Compile the temporal programs while frame 1 optimizes. (A
            # resumed run starts ON the temporal objective, so its first
            # dispatch compiles it inline — nothing to overlap with.)
            stylizer.prewarm_temporal((size_wh[1], size_wh[0]))
        pending.append(
            (dispatch, out_dir / ('%s_stylized.png' % frame_path.stem), idx))
        if len(pending) > collect_batch:   # keep the newest in flight
            batch, pending = pending[:collect_batch], pending[collect_batch:]
            drain(batch)
    if pending:
        drain(pending)
    dt = time.perf_counter() - t0
    n_done = len(frames) - start_idx
    if t_first is not None:
        steady = (dt - t_first) / max(n_done - 1, 1)
        logger.info('stylized %d frames in %.1fs (first frame %.1fs, '
                    '%.2f s/frame steady-state)', n_done, dt, t_first,
                    steady)
    else:
        # Resumed run: no frame-1 wall to subtract, and the first resumed
        # dispatch compiled the temporal programs inline — report the
        # plain average, labeled as such.
        logger.info('stylized %d resumed frames in %.1fs (%.2f s/frame '
                    'incl. the resume compile)', n_done, dt,
                    dt / max(n_done, 1))
    return 0


if __name__ == '__main__':
    sys.exit(main())

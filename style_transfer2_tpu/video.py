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
    """Drives a StyleTransfer engine across a frame sequence."""

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

    def set_style(self, style_image):
        self.st.set_style(style_image)

    def _run(self, n_iters):
        remaining = n_iters
        image = None
        while remaining > 0:
            chunk = min(self.steps_per_dispatch, remaining)
            image, trace = self.st.run_steps(chunk,
                                             fetch_image=(remaining <= chunk))
            remaining -= chunk
        return image, trace

    def stylize_frame(self, frame):
        """Stylizes one HxWx3 uint8 frame; returns the stylized HxWx3
        float32 array."""
        st = self.st
        first = self.prev_stylized is None
        st.set_content(frame)
        if first:
            init = self.rng.uniform(0, 255, frame.shape).astype(np.uint8)
            st.set_input(init)
            n = self.first_iterations
        else:
            # Warm start from the previous stylized frame + temporal pull
            # toward it.
            st.set_input(np.clip(self.prev_stylized, 0, 255))
            st.set_temporal(np.clip(self.prev_stylized, 0, 255),
                            self.temporal_weight)
            n = self.iterations
        st.is_starting = True
        st._start()
        assert st.is_running, 'engine failed to start'
        image, trace = self._run(n)
        self.prev_stylized = image
        return image, trace


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

    size_wh = None
    t0 = time.perf_counter()
    for idx, frame_path in enumerate(frames):
        frame = Image.open(frame_path).convert('RGB')
        if size_wh is None:
            size_wh = im.fit_into_square(frame.size, args.size, scale_up=True)
        frame = np.uint8(frame.resize(size_wh, Image.LANCZOS))
        image, trace = stylizer.stylize_frame(frame)
        out_path = out_dir / ('%s_stylized.png' % frame_path.stem)
        im.as_pil(image).save(out_path)
        logger.info('frame %d/%d -> %s (loss %.5g)', idx + 1, len(frames),
                    out_path.name, trace['loss'])
    dt = time.perf_counter() - t0
    logger.info('stylized %d frames in %.1fs (%.2f frames/s after warmup)',
                len(frames), dt, (len(frames) - 1) / max(dt, 1e-9))
    return 0


if __name__ == '__main__':
    sys.exit(main())

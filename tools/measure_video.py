#!/usr/bin/env python3
"""Video-mode hardware measurement: runs bench.py's video phase standalone
(pipelined frame loop, synthetic 512px pan, bf16) and prints one JSON line
with steady-state s/frame and the temporal-consistency RMS metrics.

  python tools/measure_video.py [--frames 8]
"""

import argparse
import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--frames', type=int, default=None)
    p.add_argument('--platform', default='')
    args = p.parse_args(argv)

    import os
    if args.frames:
        os.environ['BENCH_VIDEO_FRAMES'] = str(args.frames)

    import jax
    if args.platform:
        jax.config.update('jax_platforms', args.platform)
    jax.config.update('jax_compilation_cache_dir', str(ROOT / '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    import numpy as np
    from PIL import Image

    import bench
    from style_transfer2_tpu.models import random_params
    from style_transfer2_tpu.utils import resize_to_fit

    params = random_params(0)
    style = np.uint8(resize_to_fit(
        Image.open(ROOT / 'examples/starry_night.jpg').convert('RGB'),
        bench.SIZE))
    out = bench.bench_video(params, style)
    print(json.dumps(out), flush=True)
    return 0


if __name__ == '__main__':
    sys.exit(main())

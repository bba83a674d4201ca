#!/usr/bin/env python3
"""bf16-vs-f32 quality at an arbitrary size: runs bench.py's bf16_quality
phase (iteration-parity loss delta, f32-evaluated and own-arithmetic, plus
image RMS) standalone.

  python tools/measure_quality.py --size 1024
"""

import argparse
import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--size', type=int, default=1024)
    p.add_argument('--iters', type=int, default=None)
    p.add_argument('--platform', default='')
    args = p.parse_args(argv)

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

    bench.SIZE = args.size
    if args.iters:
        bench.QUALITY_ITERS = args.iters
    params = random_params(0)
    content = np.uint8(resize_to_fit(
        Image.open(ROOT / 'examples/golden_gate.jpg').convert('RGB'),
        args.size))
    style = np.uint8(resize_to_fit(
        Image.open(ROOT / 'examples/starry_night.jpg').convert('RGB'),
        args.size))
    out = bench.bench_bf16_quality(params, content, style)
    out['size'] = args.size
    out['iters'] = bench.QUALITY_ITERS
    print(json.dumps(out), flush=True)
    return 0


if __name__ == '__main__':
    sys.exit(main())

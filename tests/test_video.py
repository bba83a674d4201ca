"""Video mode tests: the temporal-consistency loss in the objective, and the
frame pipeline end-to-end (warm starts reduce flicker)."""

import numpy as np
from PIL import Image

from style_transfer2_tpu.engine import StyleTransfer
from style_transfer2_tpu.engine.objective import ObjectiveSpec
from style_transfer2_tpu.models import random_params

WEIGHTS = {'content': {'conv2_2': 0.1},
           'style': {'conv1_1': 1.0, 'conv2_1': 1.0}, 'deepdream': {}}
SCALARS = {'p': 50.0, 'p_power': 6.0, 'tv': 5.0, 'tv_power': 2.0}


def _frames(n=3, hw=(24, 24), seed=0):
    """A pattern translating one pixel per frame."""
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 256, (hw[0] + n, hw[1] + n, 3)).astype(np.uint8)
    return [base[i:i + hw[0], i:i + hw[1]] for i in range(n)]


def test_spec_temporal_flag():
    spec = ObjectiveSpec.from_weights(WEIGHTS, SCALARS)
    assert not spec.temporal
    spec_t = ObjectiveSpec.from_weights(WEIGHTS,
                                        dict(SCALARS, temporal=100.0))
    assert spec_t.temporal
    assert 'temporal_loss' in spec_t.trace_keys
    assert 'temporal_grad' in spec_t.trace_keys
    keys = spec_t.trace_keys
    assert keys.index('temporal_loss') < keys.index('scd_grad')
    assert keys.index('temporal_grad') == len(keys) - 3


def test_temporal_loss_pulls_toward_target(rng):
    # Small feature-loss weights so the temporal term dominates and the
    # mechanism is observable in a few steps.
    weights = {'content': {'conv2_2': 1e-3},
               'style': {'conv1_1': 1e-3}, 'deepdream': {}}
    scalars = {'p': 0.01, 'p_power': 6.0, 'tv': 0.01, 'tv_power': 2.0}
    frames = _frames(2)
    st = StyleTransfer(random_params(5))
    st.set_weights(weights, scalars)
    st.set_optimizer('adam')
    st.set_step_size(10.0)
    st.set_content(frames[0])
    st.set_style(rng.randint(0, 256, (24, 24, 3)).astype(np.uint8))
    st.set_input(rng.randint(0, 256, (24, 24, 3)).astype(np.uint8))
    assert st.start()
    target = frames[0]
    st.set_temporal(target, 1e6)  # overwhelming pull toward the target
    st.is_starting = True
    st._start()

    img0 = st.snapshot()
    d0 = np.mean((img0 - np.float32(target)) ** 2)
    losses = []
    for _ in range(10):
        img, trace = st.step()
        losses.append(trace['temporal_loss'])
    d1 = np.mean((img - np.float32(target)) ** 2)
    assert d1 < d0 * 0.5, (d0, d1)
    assert losses[-1] < losses[0]

    # clearing the temporal term changes the spec back
    st.clear_temporal()
    assert not st.spec().temporal
    _, trace = st.step()
    assert 'temporal_loss' not in trace


def test_video_pipeline_reduces_flicker(tmp_path, rng):
    from style_transfer2_tpu.video import VideoStylizer

    frames = _frames(3)
    style = rng.randint(0, 256, (24, 24, 3)).astype(np.uint8)
    params = random_params(5)

    def run(temporal_weight):
        v = VideoStylizer(params, WEIGHTS, SCALARS, optimizer='adam',
                          step_size=10.0, first_iterations=8, iterations=6,
                          temporal_weight=temporal_weight, seed=1,
                          steps_per_dispatch=4)
        v.set_style(style)
        outs = [v.stylize_frame(f)[0] for f in frames]
        return outs

    outs_t = run(5e4)
    flicker_t = np.mean([np.mean((a - b) ** 2)
                         for a, b in zip(outs_t, outs_t[1:])])
    outs_nt = run(1e-6)
    flicker_nt = np.mean([np.mean((a - b) ** 2)
                          for a, b in zip(outs_nt, outs_nt[1:])])
    assert flicker_t < flicker_nt, (flicker_t, flicker_nt)
    for out in outs_t:
        assert np.isfinite(out).all()


def test_video_cli_end_to_end(tmp_path, rng):
    from style_transfer2_tpu.video import main as video_main

    frames_dir = tmp_path / 'frames'
    frames_dir.mkdir()
    for i, f in enumerate(_frames(2)):
        Image.fromarray(f).save(frames_dir / ('frame_%03d.png' % i))
    style_path = tmp_path / 'style.png'
    Image.fromarray(rng.randint(0, 256, (24, 24, 3)).astype(np.uint8)).save(style_path)
    out_dir = tmp_path / 'out'

    rc = video_main([str(frames_dir), str(style_path), str(out_dir),
                     '--size', '24', '--first-iterations', '4',
                     '--iterations', '2', '--model-weights', 'random',
                     '--platform', 'cpu', '--steps-per-dispatch', '2',
                     '--optimizer', 'adam'])
    assert rc == 0
    outs = sorted(out_dir.iterdir())
    assert len(outs) == 2
    assert all(Image.open(o).size == (24, 24) for o in outs)


def test_video_resume_continues_the_chain(tmp_path, rng):
    """--resume skips the contiguous prefix of existing outputs, reseeds
    the temporal chain from the last written frame, and leaves the done
    frames untouched; with everything present it no-ops."""
    from style_transfer2_tpu.video import main as video_main

    frames_dir = tmp_path / 'frames'
    frames_dir.mkdir()
    for i, f in enumerate(_frames(4)):
        Image.fromarray(f).save(frames_dir / ('frame_%03d.png' % i))
    style_path = tmp_path / 'style.png'
    Image.fromarray(rng.randint(0, 256, (24, 24, 3))
                    .astype(np.uint8)).save(style_path)
    out_dir = tmp_path / 'out'
    args = [str(frames_dir), str(style_path), str(out_dir),
            '--size', '24', '--first-iterations', '4',
            '--iterations', '2', '--model-weights', 'random',
            '--platform', 'cpu', '--steps-per-dispatch', '2',
            '--optimizer', 'adam']

    assert video_main(args) == 0
    outs = sorted(out_dir.iterdir())
    assert len(outs) == 4
    # "Crash" after frame 2: drop the tail, resume.
    (out_dir / 'frame_002_stylized.png').unlink()
    (out_dir / 'frame_003_stylized.png').unlink()
    mtime0 = (out_dir / 'frame_000_stylized.png').stat().st_mtime
    assert video_main(args + ['--resume']) == 0
    outs = sorted(out_dir.iterdir())
    assert len(outs) == 4
    assert (out_dir / 'frame_000_stylized.png').stat().st_mtime == mtime0
    assert all(Image.open(o).size == (24, 24) for o in outs)
    # All present: pure no-op (nothing rewritten).
    mtimes = {o.name: o.stat().st_mtime for o in outs}
    assert video_main(args + ['--resume']) == 0
    assert {o.name: o.stat().st_mtime
            for o in sorted(out_dir.iterdir())} == mtimes


def test_video_pipeline_lbfgs(rng):
    """The video loop with the default L-BFGS optimizer: per-frame
    objective changes clear the history and re-prime cleanly."""
    from style_transfer2_tpu.video import VideoStylizer

    frames = _frames(3)
    style = rng.randint(0, 256, (24, 24, 3)).astype(np.uint8)
    v = VideoStylizer(random_params(5), WEIGHTS, SCALARS, optimizer='lbfgs',
                      step_size=1.0, first_iterations=4, iterations=3,
                      temporal_weight=1e4, seed=2, steps_per_dispatch=2)
    v.set_style(style)
    outs = []
    for f in frames:
        img, trace = v.stylize_frame(f)
        outs.append(img)
        assert np.isfinite(trace['loss'])
    assert v.st.t > 0
    assert 'temporal_loss' in trace  # later frames carry the temporal term
    for out in outs:
        assert np.isfinite(out).all()


def test_video_pipelined_overlap_matches_serial(rng):
    """The pipelined driver path (begin_frame N+1 enqueued BEFORE
    collect_frame N) must produce the same frames as the serial path: the
    in-flight dispatch captured its inputs, the next frame's warm start
    chains on the async scan output on device, and the lazily-primed eval
    traces land in dispatch order."""
    from style_transfer2_tpu.video import VideoStylizer

    frames = _frames(4)
    style = rng.randint(0, 256, (24, 24, 3)).astype(np.uint8)
    params = random_params(5)

    def make():
        v = VideoStylizer(params, WEIGHTS, SCALARS, optimizer='lbfgs',
                          step_size=1.0, first_iterations=4, iterations=3,
                          temporal_weight=1e4, seed=2)
        v.set_style(style)
        return v

    serial = make()
    outs_serial = [serial.stylize_frame(f)[0] for f in frames]

    piped = make()
    outs_piped = []
    pending = None
    for f in frames:
        d = piped.begin_frame(f)
        if pending is not None:
            outs_piped.append(piped.collect_frame(pending)[0])
        pending = d
    outs_piped.append(piped.collect_frame(pending)[0])

    assert len(outs_piped) == len(outs_serial)
    for i, (a, b) in enumerate(zip(outs_piped, outs_serial)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-3,
                                   err_msg='frame %d' % i)
    assert len(piped.st.traces) == len(serial.st.traces)

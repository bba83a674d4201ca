"""CLI + checkpoint tests: single-scale and multi-scale runs end-to-end on
CPU at tiny sizes, trace CSV output, checkpoint save/resume round-trip."""

import numpy as np
import pandas as pd
from PIL import Image

from style_transfer2_tpu.cli import main as cli_main


def _write_images(tmp_path):
    rng = np.random.RandomState(0)
    content = tmp_path / 'content.png'
    style = tmp_path / 'style.png'
    Image.fromarray(rng.randint(0, 256, (40, 52, 3)).astype(np.uint8)).save(content)
    Image.fromarray(rng.randint(0, 256, (44, 44, 3)).astype(np.uint8)).save(style)
    return str(content), str(style)


def test_cli_single_scale(tmp_path):
    content, style = _write_images(tmp_path)
    out = tmp_path / 'out.png'
    trace_csv = tmp_path / 'trace.csv'
    rc = cli_main([content, style, '-o', str(out), '--size', '32',
                   '--iterations', '6', '--optimizer', 'adam',
                   '--model-weights', 'random', '--platform', 'cpu',
                   '--steps-per-dispatch', '3',
                   '--trace-csv', str(trace_csv)])
    assert rc == 0
    img = Image.open(out)
    assert max(img.size) == 32

    df = pd.read_csv(trace_csv)
    assert len(df) == 6
    assert 'loss' in df.columns and 'fevals' in df.columns
    assert np.isfinite(df['loss']).all()
    assert df['fevals'].iloc[-1] == 6


def test_cli_multi_scale_and_resume(tmp_path):
    content, style = _write_images(tmp_path)
    out = tmp_path / 'out.png'
    ckpt = tmp_path / 'ckpt'
    rc = cli_main([content, style, '-o', str(out), '--size', '36',
                   '--iterations', '3', '--optimizer', 'lbfgs',
                   '--model-weights', 'random', '--platform', 'cpu',
                   '--multi-scale', '--min-scale', '18',
                   '--steps-per-dispatch', '2',
                   '--checkpoint', str(ckpt)])
    assert rc == 0
    assert max(Image.open(out).size) == 36
    assert (ckpt / 'meta.json').exists()

    # Resume from the checkpoint: continues at the final scale.
    out2 = tmp_path / 'out2.png'
    rc = cli_main([content, style, '-o', str(out2), '--size', '36',
                   '--iterations', '2', '--optimizer', 'lbfgs',
                   '--model-weights', 'random', '--platform', 'cpu',
                   '--multi-scale', '--min-scale', '18',
                   '--resume', str(ckpt)])
    assert rc == 0
    assert max(Image.open(out2).size) == 36


def test_cli_prewarm_ladder_matches_plain(tmp_path):
    """--prewarm-ladder compiles the next rung on a throwaway engine while
    the current rung runs: the optimization trajectory must be bit-identical
    to a run without it."""
    content, style = _write_images(tmp_path)
    traces = []
    for i, flag in enumerate(([], ['--prewarm-ladder'])):
        out = tmp_path / f'out{i}.png'
        csv = tmp_path / f'trace{i}.csv'
        rc = cli_main([content, style, '-o', str(out), '--size', '36',
                       '--iterations', '3', '--optimizer', 'adam',
                       '--model-weights', 'random', '--platform', 'cpu',
                       '--multi-scale', '--min-scale', '18',
                       '--steps-per-dispatch', '2',
                       '--trace-csv', str(csv)] + flag)
        assert rc == 0
        traces.append(pd.read_csv(csv))
    plain, prewarmed = traces
    assert len(plain) == len(prewarmed)
    for col in plain.columns:
        if col == 'time':
            continue
        np.testing.assert_array_equal(plain[col].to_numpy(),
                                      prewarmed[col].to_numpy(), col)


def test_cli_pipelined_matches_sync(tmp_path):
    """--pipeline-depth N keeps several fused chunks in flight (consecutive
    begin_steps chain on device): the chunk plan is fixed up front, so the
    trajectory, trace CSV and --save-every snapshots must be bit-identical
    to the synchronous depth-1 loop."""
    content, style = _write_images(tmp_path)
    traces, images = [], []
    for depth in ('1', '3'):
        out = tmp_path / f'out_d{depth}.png'
        csv = tmp_path / f'trace_d{depth}.csv'
        rc = cli_main([content, style, '-o', str(out), '--size', '32',
                       '--iterations', '7', '--optimizer', 'lbfgs',
                       '--model-weights', 'random', '--platform', 'cpu',
                       '--steps-per-dispatch', '2', '--save-every', '2',
                       '--pipeline-depth', depth,
                       '--trace-csv', str(csv)])
        assert rc == 0
        traces.append(pd.read_csv(csv))
        images.append(np.asarray(Image.open(out)))
    sync, piped = traces
    assert len(sync) == len(piped)
    for col in sync.columns:
        if col == 'time':
            continue
        np.testing.assert_array_equal(sync[col].to_numpy(),
                                      piped[col].to_numpy(), col)
    np.testing.assert_array_equal(images[0], images[1])


def test_cli_polish_refines_at_full_precision(tmp_path):
    """--polish N runs N full-precision iterations warm-started from the
    main run's final iterate. Two guarantees are asserted:

    1. The polish trace's FIRST row (the f32 evaluation of the bf16
       result) is commensurate with the main run's final loss — i.e. the
       polish engine inherited the main run's first-eval gradient-RMS
       norms and evaluates the SAME normalized objective (reference
       semantics: norms persist across everything but reset,
       worker.py:137,172-175). A re-anchoring regression shows up here
       as an order-of-magnitude mismatch.
    2. The polish phase reaches a lower loss than the prime somewhere in
       its trace. Fixed-step L-BFGS has no line search and is NOT
       monotone on this 32px toy (the main run itself swings 45k->117k
       ->79k), so the assertion is on the trace minimum over 16
       iterations, not on the final row.
    """
    content, style = _write_images(tmp_path)
    out = tmp_path / 'out.png'
    csv = tmp_path / 'trace.csv'
    rc = cli_main([content, style, '-o', str(out), '--size', '32',
                   '--iterations', '8', '--optimizer', 'lbfgs',
                   '--model-weights', 'random', '--platform', 'cpu',
                   '--steps-per-dispatch', '4', '--precision', 'bfloat16',
                   '--polish', '16', '--polish-precision', 'float32',
                   '--trace-csv', str(csv)])
    assert rc == 0
    main = pd.read_csv(csv)
    polish = pd.read_csv(tmp_path / 'trace.polish.csv')
    assert len(main) == 9      # prime + 8 main iterations
    assert len(polish) == 17   # prime (f32 eval of the bf16 result) + 16
    prime, final_main = polish['loss'].iloc[0], main['loss'].iloc[-1]
    assert abs(prime - final_main) / final_main < 0.05
    assert polish['loss'].min() < prime
    assert np.asarray(Image.open(out)).shape[-1] == 3


def test_checkpoint_roundtrip_preserves_state(tmp_path):
    from style_transfer2_tpu.engine import StyleTransfer
    from style_transfer2_tpu.engine.checkpoint import (load_checkpoint,
                                                       save_checkpoint)
    from style_transfer2_tpu.models import random_params

    weights = {'content': {'conv2_2': 0.1},
               'style': {'conv1_1': 1.0, 'conv2_1': 1.0}, 'deepdream': {}}
    scalars = {'p': 50.0, 'p_power': 6.0, 'tv': 5.0, 'tv_power': 2.0}
    rng = np.random.RandomState(4)
    imgs = [rng.randint(0, 256, (24, 24, 3)).astype(np.uint8)
            for _ in range(3)]

    def fresh():
        st = StyleTransfer(random_params(1))
        st.set_weights(weights, scalars)
        st.set_optimizer('lbfgs')
        st.set_step_size(1.0)
        st.set_content(imgs[0])
        st.set_style(imgs[1])
        st.set_input(imgs[2])
        assert st.start()
        return st

    a = fresh()
    for _ in range(3):
        a.step()
    save_checkpoint(a, tmp_path / 'ck')

    b = StyleTransfer(random_params(1))
    load_checkpoint(b, tmp_path / 'ck')
    b.is_starting = True
    b._start()
    assert b.t == 3
    assert b.optimizer_name == 'lbfgs'
    assert int(b.opt_state['count']) == int(a.opt_state['count'])
    np.testing.assert_allclose(np.asarray(b.input), np.asarray(a.input))

    # Continue both; they must track exactly (same norms, same history).
    img_a, trace_a = a.step()
    img_b, trace_b = b.step()
    for key in trace_a:
        if key in ('time',):
            continue
        np.testing.assert_allclose(trace_a[key], trace_b[key],
                                   rtol=1e-5, err_msg=key)
    np.testing.assert_allclose(img_a, img_b, rtol=1e-5, atol=1e-4)


def test_checkpoint_migrates_flat_lbfgs_history(tmp_path):
    """Checkpoints written during the short-lived flat-history window
    stored the L-BFGS buffers as (n_corr, N); load_checkpoint reshapes
    them back to (n_corr,) + x.shape (the flat layout regressed 26-40%
    on hardware and was reverted — docs/ROUND3.md part 4) and the
    restored session must track the original exactly."""
    import jax.numpy as jnp

    from style_transfer2_tpu.engine import StyleTransfer
    from style_transfer2_tpu.engine.checkpoint import (load_checkpoint,
                                                       save_checkpoint)
    from style_transfer2_tpu.models import random_params

    weights = {'content': {'conv2_2': 0.1},
               'style': {'conv1_1': 1.0, 'conv2_1': 1.0}, 'deepdream': {}}
    scalars = {'p': 50.0, 'p_power': 6.0, 'tv': 5.0, 'tv_power': 2.0}
    rng = np.random.RandomState(5)
    imgs = [rng.randint(0, 256, (24, 24, 3)).astype(np.uint8)
            for _ in range(3)]
    a = StyleTransfer(random_params(1))
    a.set_weights(weights, scalars)
    a.set_optimizer('lbfgs')
    a.set_step_size(1.0)
    a.set_content(imgs[0])
    a.set_style(imgs[1])
    a.set_input(imgs[2])
    assert a.start()
    for _ in range(3):
        a.step()

    # Simulate a flat-window checkpoint: flatten the history on disk only.
    shaped = {k: a.opt_state[k] for k in ('sk', 'yk')}
    a.opt_state = dict(a.opt_state)
    for k in ('sk', 'yk'):
        a.opt_state[k] = jnp.reshape(shaped[k], (shaped[k].shape[0], -1))
    save_checkpoint(a, tmp_path / 'ck')
    a.opt_state.update(shaped)

    b = StyleTransfer(random_params(1))
    load_checkpoint(b, tmp_path / 'ck')
    b.is_starting = True
    b._start()
    for k in ('sk', 'yk'):
        assert b.opt_state[k].shape == shaped[k].shape
        np.testing.assert_array_equal(np.asarray(b.opt_state[k]),
                                      np.asarray(shaped[k]))
    img_a, trace_a = a.step()
    img_b, trace_b = b.step()
    for key in trace_a:
        if key in ('time',):
            continue
        np.testing.assert_allclose(trace_a[key], trace_b[key],
                                   rtol=1e-5, err_msg=key)
    np.testing.assert_allclose(img_a, img_b, rtol=1e-5, atol=1e-4)


def test_cli_batch_mode(tmp_path):
    """--batch styles a directory as lanes of one vmapped program: images
    group by fitted grid (no distortion), waves bounded by --lanes, one
    output per input; --data-mesh shards the lane axis (virtual mesh)."""
    rng = np.random.RandomState(1)
    indir = tmp_path / 'in'
    indir.mkdir()
    # Two 40x60 images (one grid group, one wave of 2) + one 50x50.
    for name, size in (('a', (40, 60)), ('b', (40, 60)), ('c', (50, 50))):
        Image.fromarray(rng.randint(0, 256, size + (3,))
                        .astype(np.uint8)).save(indir / (name + '.png'))
    style = tmp_path / 'style.png'
    Image.fromarray(rng.randint(0, 256, (44, 44, 3))
                    .astype(np.uint8)).save(style)
    outdir = tmp_path / 'out'

    rc = cli_main([str(indir), str(style), '--batch', '-o', str(outdir),
                   '--size', '32', '--iterations', '4', '--lanes', '2',
                   '--optimizer', 'adam', '--model-weights', 'random',
                   '--platform', 'cpu', '--steps-per-dispatch', '2',
                   '--data-mesh', '2'])
    assert rc == 0
    outs = sorted(p.name for p in outdir.iterdir())
    assert outs == ['a_styled.png', 'b_styled.png', 'c_styled.png']
    a = Image.open(outdir / 'a_styled.png')
    c = Image.open(outdir / 'c_styled.png')
    assert (a.size[1], a.size[0]) == (21, 32)   # 40x60 fit into 32
    assert (c.size[1], c.size[0]) == (32, 32)
    # Distinct contents produced distinct stylizations (no lane mixing).
    arr_a = np.asarray(a, np.float32)
    arr_b = np.asarray(Image.open(outdir / 'b_styled.png'), np.float32)
    assert np.abs(arr_a - arr_b).mean() > 1.0


def test_cli_batch_skip_existing(tmp_path):
    """--skip-existing restarts an interrupted batch at the first missing
    output: styled images are left untouched, only the rest run."""
    rng = np.random.RandomState(5)
    indir = tmp_path / 'in'
    indir.mkdir()
    for name in ('a', 'b', 'c'):
        Image.fromarray(rng.randint(0, 256, (40, 60, 3))
                        .astype(np.uint8)).save(indir / (name + '.png'))
    style = tmp_path / 'style.png'
    Image.fromarray(rng.randint(0, 256, (44, 44, 3))
                    .astype(np.uint8)).save(style)
    outdir = tmp_path / 'out'
    args = [str(indir), str(style), '--batch', '-o', str(outdir),
            '--size', '32', '--iterations', '4', '--lanes', '2',
            '--optimizer', 'adam', '--model-weights', 'random',
            '--platform', 'cpu', '--steps-per-dispatch', '2']

    assert cli_main(args) == 0
    assert len(list(outdir.iterdir())) == 3
    (outdir / 'b_styled.png').unlink()
    (outdir / 'c_styled.png').unlink()
    mtime_a = (outdir / 'a_styled.png').stat().st_mtime
    assert cli_main(args + ['--skip-existing']) == 0
    assert sorted(p.name for p in outdir.iterdir()) == \
        ['a_styled.png', 'b_styled.png', 'c_styled.png']
    assert (outdir / 'a_styled.png').stat().st_mtime == mtime_a
    # Everything present: no-op.
    mtimes = {p.name: p.stat().st_mtime for p in outdir.iterdir()}
    assert cli_main(args + ['--skip-existing']) == 0
    assert {p.name: p.stat().st_mtime for p in outdir.iterdir()} == mtimes


def test_cli_batch_pipelined_matches_sync(tmp_path):
    """--batch with --pipeline-depth N keeps several fused chunks in
    flight per wave (begin_steps_all chains on device); the chunk plan is
    fixed up front, so every output image must be bit-identical to the
    synchronous depth-1 run."""
    rng = np.random.RandomState(7)
    indir = tmp_path / 'in'
    indir.mkdir()
    for name in ('a', 'b'):
        Image.fromarray(rng.randint(0, 256, (40, 60, 3))
                        .astype(np.uint8)).save(indir / (name + '.png'))
    style = tmp_path / 'style.png'
    Image.fromarray(rng.randint(0, 256, (44, 44, 3))
                    .astype(np.uint8)).save(style)

    outs = []
    for depth in ('1', '3'):
        outdir = tmp_path / f'out_d{depth}'
        rc = cli_main([str(indir), str(style), '--batch', '-o',
                       str(outdir), '--size', '32', '--iterations', '7',
                       '--lanes', '2', '--optimizer', 'lbfgs',
                       '--model-weights', 'random', '--platform', 'cpu',
                       '--steps-per-dispatch', '2',
                       '--pipeline-depth', depth])
        assert rc == 0
        outs.append({p.name: np.asarray(Image.open(p))
                     for p in outdir.iterdir()})
    sync, piped = outs
    assert sorted(sync) == ['a_styled.png', 'b_styled.png'] == sorted(piped)
    for name in sync:
        np.testing.assert_array_equal(sync[name], piped[name], name)

"""bench.py outage-resilience: a wedged device or a driver kill mid-phase
must still leave the already-measured headline on stdout (round 2 lost all
its numbers because the single print lived after every fragile phase).

These tests drive the phase machinery in subprocesses — run_phase's
timeout path and the signal flush both end in os._exit, which would take
pytest down in-process. No device backend is involved.
"""

import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).parent.parent


def run_snippet(code, **kw):
    env = dict(os.environ, PYTHONPATH=str(REPO))
    return subprocess.run([sys.executable, '-c', code], cwd=REPO,
                          capture_output=True, text=True, env=env, **kw)


def test_phase_exception_records_error_and_continues():
    import bench
    result = {'value': 1.0}
    out = bench.run_phase('shaky', 5.0,
                          lambda: (_ for _ in ()).throw(RuntimeError('boom')),
                          result)
    assert out is None
    assert 'RuntimeError: boom' in result['shaky_error']


def test_phase_success_returns_value_and_checkpoints():
    import bench
    result = {'value': 2.0}
    assert bench.run_phase('fine', 5.0, lambda: 42, result) == 42
    partial = json.loads((REPO / '.bench_partial.json').read_text())
    assert partial['value'] == 2.0
    (REPO / '.bench_partial.json').unlink()


def test_phase_timeout_emits_partial_headline():
    """A hang in a late phase (wedged tunnel) flushes the headline and
    exits 0 because a value was already measured."""
    proc = run_snippet(
        "import time, bench\n"
        "result = {'metric': 'm', 'value': 46.2, 'unit': 'it/s',"
        " 'vs_baseline': 388.0}\n"
        "bench.run_phase('northstar', 0.3, lambda: time.sleep(60), result)\n"
        "raise SystemExit('unreachable')\n",
        timeout=30)
    assert proc.returncode == 0
    line = json.loads(proc.stdout.strip().splitlines()[-1])
    assert line['value'] == 46.2
    assert 'timed out' in line['northstar_error']


def test_phase_timeout_without_headline_exits_3():
    proc = run_snippet(
        "import time, bench\n"
        "result = {'metric': 'm', 'value': 0, 'unit': 'it/s',"
        " 'vs_baseline': 0}\n"
        "bench.run_phase('headline', 0.3, lambda: time.sleep(60), result,"
        " fatal=True)\n",
        timeout=30)
    assert proc.returncode == 3
    line = json.loads(proc.stdout.strip().splitlines()[-1])
    assert line['value'] == 0


def test_sigterm_mid_phase_flushes_headline():
    """Driver kill (SIGTERM) mid-north-star still prints the headline."""
    env = dict(os.environ, PYTHONPATH=str(REPO))
    proc = subprocess.Popen(
        [sys.executable, '-u', '-c',
         "import time, bench\n"
         "result = {'metric': 'm', 'value': 46.2, 'unit': 'it/s',"
         " 'vs_baseline': 388.0}\n"
         "bench._install_partial_flush(result)\n"
         "print('READY', flush=True)\n"
         "time.sleep(120)\n"],
        cwd=REPO, env=env, stdout=subprocess.PIPE, text=True)
    assert proc.stdout.readline().strip() == 'READY'
    proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=30)
    assert proc.returncode == 0
    line = json.loads(out.strip().splitlines()[-1])
    assert line['value'] == 46.2
    assert 'signal' in line['error']


def test_run_to_plateau_pipelined_counts_and_stops(monkeypatch):
    """The pipelined plateau loop (chunks PIPELINE deep on device) must
    stop on the per-chunk tolerance, drain and COUNT the speculative
    in-flight chunk, and still honor the max_iters cap exactly."""
    import numpy as np

    import bench
    from style_transfer2_tpu.models import random_params

    monkeypatch.setattr(bench, 'NS_CHUNK', 4)
    params = random_params(0)
    rng = np.random.RandomState(0)
    content = rng.randint(0, 255, (48, 64, 3), dtype=np.uint8)
    style = rng.randint(0, 255, (48, 64, 3), dtype=np.uint8)
    init = rng.uniform(0, 255, content.shape).astype(np.uint8)

    st = bench._make_engine(params, content, style, init, 'float32')
    iters, loss = bench._run_to_plateau(st, max_iters=40, tol=0.5)
    # Loose tol stops after chunk 2's check; chunk 3 (in flight) drains
    # and counts. Every enqueued iteration is accounted for in the engine.
    assert iters == st.t
    assert 8 < iters < 40
    assert np.isfinite(loss)

    st2 = bench._make_engine(params, content, style, init, 'float32')
    iters2, loss2 = bench._run_to_plateau(st2, max_iters=12, tol=0.0)
    assert iters2 == 12 and np.isfinite(loss2)


def test_emit_prints_exactly_once():
    proc = run_snippet(
        "import bench\n"
        "r = {'metric': 'm', 'value': 1, 'unit': 'u', 'vs_baseline': 1}\n"
        "bench.emit(r)\n"
        "bench.emit(r)\n",
        timeout=30)
    lines = [l for l in proc.stdout.splitlines() if l.strip()]
    assert len(lines) == 1

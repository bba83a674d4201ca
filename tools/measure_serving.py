#!/usr/bin/env python3
"""Measure end-to-end serving throughput: start a real tier in-process,
connect as a browser (WS + cookies), count iterateInfo frames per second.

Covers the two pending round-3 serving measurements on the 5.09 ms bf16
step (CLAUDE.md): the interactive single-session rate (adaptive + depth-2
pipelined dispatch) and the pooled aggregate rate across N concurrent
sessions. Prints one JSON line per run.

Examples:
  python tools/measure_serving.py --tier app --size 300 --adaptive 60
  python tools/measure_serving.py --tier pool --size 256 --lanes 4 \\
      --steps-per-dispatch 60
"""

import argparse
import asyncio
import configparser
import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def base_config(args):
    cp = configparser.ConfigParser()
    cp['DEFAULT'] = {
        'debug': '0',
        'initial_content': 'examples/golden_gate.jpg',
        'initial_style': 'examples/starry_night.jpg',
        'initial_size': str(args.size),
        'initial_weights': 'initial_weights.yaml',
        'http_host': '127.0.0.1',
        'http_port': '8000',
        'weights': 'random',
        'precision': args.precision,
        'max_size': '4096',
    }
    return cp['DEFAULT']


async def count_iterates(ws, seconds, warmup_frames=5):
    """Counts iterations from iterateInfo frames after a warmup (compile +
    ramp) and returns (its_per_s, first_i, last_i)."""
    import aiohttp
    first_i = last_i = None
    n_warm = 0
    t0 = None
    deadline = None
    while True:
        msg = await asyncio.wait_for(ws.receive(), 1200)
        if msg.type != aiohttp.WSMsgType.TEXT:
            continue
        data = json.loads(msg.data)
        if data['type'] != 'iterateInfo':
            continue
        if n_warm < warmup_frames:
            n_warm += 1
            continue
        now = time.perf_counter()
        if first_i is None:
            first_i, t0 = data['i'], now
            deadline = now + seconds
        last_i = data['i']
        if now >= deadline:
            return (last_i - first_i) / (now - t0), first_i, last_i


async def run_app(args):
    import aiohttp
    from aiohttp.test_utils import TestClient, TestServer
    from style_transfer2_tpu.serve.app import init

    config = base_config(args)
    config['adaptive_dispatch'] = str(args.adaptive)
    config['pipeline_depth'] = str(args.pipeline_depth)
    if args.latency_target:
        config['adaptive_latency_target'] = str(args.latency_target)
    app = init(config=config)
    client = TestClient(TestServer(app))
    await client.start_server()
    ws = await client.ws_connect('/websocket')
    # Wait for the driver before starting.
    while True:
        data = json.loads((await asyncio.wait_for(ws.receive(), 1200)).data)
        if data['type'] == 'workerReady':
            break
    await ws.send_str(json.dumps({'type': 'start'}))
    rate, i0, i1 = await count_iterates(ws, args.seconds)
    result = {'tier': 'app', 'size': args.size, 'precision': args.precision,
              'adaptive': args.adaptive,
              'pipeline_depth': args.pipeline_depth,
              'its_per_s': round(rate, 1), 'iters': i1 - i0,
              'time_to_first_iterate_s': app['tier'].first_iterate_s}
    tuner = app['tier'].driver.tuner
    if tuner is not None:
        result['latency_target'] = args.latency_target
        result['tuner_step_ms'] = (round(tuner.step_s * 1e3, 2)
                                   if tuner.step_s else None)
        result['tuner_rtt_ms'] = (round(tuner.rtt_s * 1e3, 1)
                                  if tuner.rtt_s else None)
        result['tuner_plan'] = list(tuner.plan(
            max(1, args.adaptive // args.pipeline_depth),
            args.pipeline_depth))
    await ws.close()
    await client.close()
    return result


async def run_pool(args):
    import aiohttp
    from aiohttp.test_utils import TestClient, TestServer
    from style_transfer2_tpu.serve.pool import init

    config = base_config(args)
    config['pool_lanes'] = str(args.lanes)
    config['pool_optimizer'] = 'adam'
    config['pool_steps_per_dispatch'] = str(args.steps_per_dispatch)
    app = init(config=config)
    jar = aiohttp.DummyCookieJar()
    client = TestClient(TestServer(app), cookie_jar=jar)
    await client.start_server()

    async def one_session():
        resp = await client.get('/')
        cookie = next(c.value for c in resp.cookies.values()
                      if c.key == 'pool_session')
        headers = {'Cookie': 'pool_session=%s' % cookie}
        ws = await client.ws_connect('/websocket', headers=headers)
        while True:
            data = json.loads(
                (await asyncio.wait_for(ws.receive(), 1200)).data)
            if data['type'] == 'state':
                break
        await ws.send_str(json.dumps({'type': 'start'}))
        rate, i0, i1 = await count_iterates(ws, args.seconds)
        await ws.close()
        return rate

    rates = await asyncio.gather(*[one_session()
                                   for _ in range(args.lanes)])
    await client.close()
    return {'tier': 'pool', 'size': args.size, 'precision': args.precision,
            'lanes': args.lanes,
            'steps_per_dispatch': args.steps_per_dispatch,
            'per_session_its_per_s': [round(r, 1) for r in rates],
            'aggregate_its_per_s': round(sum(rates), 1)}


async def run_resize(args):
    """Mid-run resize latency: seconds from the applyParams size change to
    the first iterate computed at the new grid. A cold resize pays the new
    grid's XLA compile inside this window; with --prewarm the driver
    compiled it in the background first (prewarm_sizes), so the delta
    between the two arms is the compile time the prewarm hides."""
    import aiohttp
    import yaml
    from aiohttp.test_utils import TestClient, TestServer
    from style_transfer2_tpu.serve.app import init

    config = base_config(args)
    config['adaptive_dispatch'] = str(args.adaptive)
    config['pipeline_depth'] = str(args.pipeline_depth)
    if args.prewarm:
        config['prewarm_sizes'] = str(args.resize_to)
    app = init(config=config)
    client = TestClient(TestServer(app))
    await client.start_server()
    tier = app['tier']
    ws = await client.ws_connect('/websocket')
    params_text = None
    ready = False
    while not (ready and params_text):
        data = json.loads((await asyncio.wait_for(ws.receive(), 1200)).data)
        if data['type'] == 'newParams':
            params_text = data['params']
        ready = ready or data['type'] == 'workerReady'
    await ws.send_str(json.dumps({'type': 'start'}))
    # Steady state on the live grid (compiles it, ramps the dispatcher).
    await count_iterates(ws, args.warm_seconds)
    if args.prewarm:
        # The background prewarm must have finished for this arm to
        # measure what it claims. Iteration keeps running meanwhile.
        while (tier.driver._prewarm_task is None
               or not tier.driver._prewarm_task.done()):
            await asyncio.sleep(0.5)

    doc = yaml.safe_load(params_text)
    doc['size'] = args.resize_to
    hw_before = tier.driver.transfer.input_hw
    t0 = time.perf_counter()
    await ws.send_str(json.dumps({'type': 'applyParams',
                                  'params': yaml.safe_dump(doc)}))
    # The engine's grid flips when the driver processes SetImages; iterate
    # numbers from dispatches made before the flip never exceed the
    # engine's t at flip time, so the first frame with i > mark is the
    # first new-grid iterate (mark is read ≤ one poll interval after the
    # flip — worst case one single-step dispatch of slack, since control
    # traffic forces the next dispatch to a single step).
    mark = None
    latency = None
    while latency is None:
        try:
            msg = await asyncio.wait_for(ws.receive(), 0.1)
        except asyncio.TimeoutError:
            msg = None
        if mark is None and tier.driver.transfer.input_hw != hw_before:
            mark = tier.driver.transfer.t
        if msg is None or msg.type != aiohttp.WSMsgType.TEXT:
            continue
        data = json.loads(msg.data)
        if (data['type'] == 'iterateInfo' and mark is not None
                and data['i'] > mark):
            latency = time.perf_counter() - t0
    await ws.close()
    await client.close()
    return {'tier': 'app', 'mode': 'resize', 'size': args.size,
            'resize_to': args.resize_to, 'prewarm': bool(args.prewarm),
            'precision': args.precision,
            'resize_latency_s': round(latency, 2)}


async def run_converge(args):
    """Wall-clock to a plateaued loss THROUGH the serving tier, with or
    without the multi-scale ladder (--ladder N iters/rung): boots the app
    at --size, starts via WS, and watches iterateInfo until the loss at
    the TARGET grid stops improving (same plateau rule as bench.py's north
    star: relative drop per 60-iteration window < 1e-3). The ladder arm
    measures the automated coarse-to-fine schedule a fresh web session
    gets (VERDICT r3 #4); run each arm twice in the hw queue — the first
    pays cold compiles, the second is the measurement."""
    import aiohttp
    from aiohttp.test_utils import TestClient, TestServer
    from style_transfer2_tpu.serve.app import init

    config = base_config(args)
    config['adaptive_dispatch'] = str(args.adaptive)
    config['pipeline_depth'] = str(args.pipeline_depth)
    if args.latency_target:
        config['adaptive_latency_target'] = str(args.latency_target)
    if args.ladder:
        config['serve_ladder'] = str(args.ladder)
        config['ladder_min_scale'] = str(args.ladder_min_scale)
    if args.polish:
        config['serve_polish'] = str(args.polish)
        config['polish_precision'] = args.polish_precision
    app = init(config=config)
    client = TestClient(TestServer(app))
    await client.start_server()
    tier = app['tier']
    ws = await client.ws_connect('/websocket')
    while True:
        data = json.loads((await asyncio.wait_for(ws.receive(), 1200)).data)
        if data['type'] == 'workerReady':
            break
    t0 = time.perf_counter()
    await ws.send_str(json.dumps({'type': 'start'}))

    window = 60
    best_in_window = None
    prev_window_best = None
    at_target_since = None
    frames = 0
    wall = loss = None
    deadline = t0 + args.seconds
    if args.polish:
        # Polish arm: the session paces itself (ladder budgets, then the
        # full-precision tail, then it pauses). Run to the self-pause and
        # record the last polish iterate's loss — it is evaluated at the
        # polish precision, directly comparable to an f32 arm's converged
        # loss.
        last_loss = None
        while time.perf_counter() < deadline:
            msg = await asyncio.wait_for(ws.receive(), 1200)
            if msg.type != aiohttp.WSMsgType.TEXT:
                continue
            data = json.loads(msg.data)
            if data['type'] == 'iterateInfo':
                frames += 1
                last_loss = float(data['trace']['loss'])
            if (tier.polish is None and not tier.sess.running
                    and tier._precision_override is not None):
                wall = time.perf_counter() - t0
                loss = last_loss
                break
        if wall is None:
            wall = time.perf_counter() - t0
            loss = last_loss if last_loss is not None else float('nan')
        result = {'tier': 'app', 'mode': 'converge', 'size': args.size,
                  'precision': args.precision, 'ladder': args.ladder,
                  'polish': args.polish,
                  'polish_precision': args.polish_precision,
                  'iters': frames, 'converged_wall_s': round(wall, 1),
                  'converged_loss': float('%.6g' % loss),
                  'time_to_first_iterate_s': tier.first_iterate_s}
        await ws.close()
        await client.close()
        return result
    while time.perf_counter() < deadline:
        msg = await asyncio.wait_for(ws.receive(), 1200)
        if msg.type != aiohttp.WSMsgType.TEXT:
            continue
        data = json.loads(msg.data)
        if data['type'] != 'iterateInfo':
            continue
        frames += 1
        at_target = (tier.ladder is None and tier.sess.input_arr is not None
                     and max(tier.sess.input_arr.shape[:2]) == args.size)
        if not at_target:
            continue
        if at_target_since is None:
            at_target_since = data['i']
        cur = float(data['trace']['loss'])
        best_in_window = cur if best_in_window is None else min(
            best_in_window, cur)
        if (data['i'] - at_target_since) % window == window - 1:
            if (prev_window_best is not None
                    and (prev_window_best - best_in_window)
                    < 1e-3 * abs(best_in_window)):
                wall = time.perf_counter() - t0
                loss = best_in_window
                break
            prev_window_best = best_in_window
            best_in_window = None
    if wall is None:
        wall = time.perf_counter() - t0
        loss = best_in_window if best_in_window is not None else float('nan')
    result = {'tier': 'app', 'mode': 'converge', 'size': args.size,
              'precision': args.precision, 'ladder': args.ladder,
              'iters': frames, 'converged_wall_s': round(wall, 1),
              'converged_loss': float('%.6g' % loss),
              'time_to_first_iterate_s': tier.first_iterate_s}
    await ws.close()
    await client.close()
    return result


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--tier', choices=('app', 'pool'), default='app')
    p.add_argument('--size', type=int, default=300)
    p.add_argument('--precision', default='bfloat16')
    p.add_argument('--seconds', type=float, default=30.0,
                   help='measurement window after warmup')
    p.add_argument('--adaptive', type=int, default=60)
    p.add_argument('--pipeline-depth', type=int, default=2)
    p.add_argument('--lanes', type=int, default=4)
    p.add_argument('--steps-per-dispatch', type=int, default=60)
    p.add_argument('--latency-target', type=float, default=0.0,
                   help='enable adaptive_latency_target auto-tuning (app '
                        'tier); the result reports the tuner estimates')
    p.add_argument('--resize-to', type=int, default=0,
                   help='measure mid-run resize latency to this size '
                        'instead of throughput (app tier only)')
    p.add_argument('--prewarm', action='store_true',
                   help='with --resize-to: prewarm the target size in the '
                        'background first (prewarm_sizes)')
    p.add_argument('--warm-seconds', type=float, default=10.0,
                   help='steady-state window before a --resize-to change')
    p.add_argument('--converge', action='store_true',
                   help='measure wall-to-plateaued-loss at --size through '
                        'the serving tier (--seconds is the cap)')
    p.add_argument('--ladder', type=int, default=0,
                   help='with --converge: enable the multi-scale serving '
                        'ladder at N iters/rung')
    p.add_argument('--ladder-min-scale', type=int, default=256)
    p.add_argument('--polish', type=int, default=0,
                   help='with --converge --ladder: full-precision polish '
                        'tail of N iterations after the ladder (config '
                        'serve_polish); the run ends at the self-pause')
    p.add_argument('--polish-precision', default='float32_fast',
                   choices=('float32', 'float32_fast'))
    p.add_argument('--platform', default='')
    args = p.parse_args(argv)

    if args.platform:
        import jax
        jax.config.update('jax_platforms', args.platform)
    import jax as _jax
    _jax.config.update('jax_compilation_cache_dir', str(ROOT / '.jax_cache'))
    _jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    if args.converge:
        runner = run_converge
    elif args.resize_to:
        runner = run_resize
    else:
        runner = run_app if args.tier == 'app' else run_pool
    result = asyncio.run(runner(args))
    print(json.dumps(result), flush=True)
    return 0


if __name__ == '__main__':
    sys.exit(main())

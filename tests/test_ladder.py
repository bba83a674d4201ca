"""Multi-scale serving ladder: a fresh session with `ladder` in its params
coarse-to-fines up the scales() schedule to the requested size through the
REAL serving tier (WS protocol), with each rung warm-started and the next
rung prewarmed in the background — the CLI's measured-better schedule
(2.9x lower converged loss, BENCH_r03) as a serving feature."""

import asyncio
import configparser
import json

import numpy as np
from aiohttp import WSMsgType
from aiohttp.test_utils import TestClient, TestServer

from style_transfer2_tpu.utils import scales


def _config(**extra):
    cp = configparser.ConfigParser()
    cp['DEFAULT'] = {
        'debug': '0',
        'initial_content': 'examples/golden_gate.jpg',
        'initial_style': 'examples/starry_night.jpg',
        'initial_size': '48',
        'initial_weights': 'initial_weights.yaml',
        'http_host': '127.0.0.1',
        'http_port': '8000',
        'max_size': '96',
        'weights': 'random',
        'precision': 'float32',
        **{k: str(v) for k, v in extra.items()},
    }
    return cp['DEFAULT']


async def _recv_until(ws, kind, timeout=120):
    """Collects WS messages until one of `kind` arrives; returns (msg,
    all messages seen)."""
    seen = []
    async def go():
        while True:
            raw = await ws.receive()
            assert raw.type == WSMsgType.TEXT, raw
            msg = json.loads(raw.data)
            seen.append(msg)
            if msg['type'] == kind:
                return msg
    return await asyncio.wait_for(go(), timeout), seen


def test_serving_ladder_climbs_to_target():
    from style_transfer2_tpu.serve.app import init

    loop = asyncio.new_event_loop()
    asyncio.set_event_loop(loop)
    per_rung = 3
    app = init(config=_config(serve_ladder=per_rung, ladder_min_scale=24))
    client = TestClient(TestServer(app), loop=loop)
    loop.run_until_complete(client.start_server())
    try:
        async def run():
            tier = app['tier']
            ws = await client.ws_connect('/websocket')
            # Greeting: params carry the seeded ladder key; newSize is the
            # target grid.
            greeting, _ = await _recv_until(ws, 'newSize')
            target_hw = (greeting['height'], greeting['width'])
            assert max(target_hw) == 48
            rungs = scales(target_hw, min_size=24)
            assert len(rungs) >= 2

            await ws.send_str(json.dumps({'type': 'start'}))
            # First observable newSize after start = the drop to rung 0.
            first, _ = await _recv_until(ws, 'newSize')
            assert (first['height'], first['width']) == rungs[0]

            # Then the ladder climbs; collect newSize events until the
            # target grid lands and the ladder controller clears.
            sizes = [rungs[0]]
            for _ in range(len(rungs) - 1):
                msg, _ = await _recv_until(ws, 'newSize')
                sizes.append((msg['height'], msg['width']))
            assert sizes == rungs, (sizes, rungs)

            # Ladder done: controller idle, session still running at the
            # target grid (input_arr updates on the next image-bearing
            # iterate after the final rung advance).
            for _ in range(200):
                if (tier.ladder is None
                        and tier.sess.input_arr.shape[:2] == tuple(rungs[-1])):
                    break
                await asyncio.sleep(0.2)
            assert tier.ladder is None
            assert tier.sess.running
            assert tier.sess.input_arr.shape[:2] == tuple(rungs[-1])
            # Iterates kept flowing throughout (ladder advanced on them).
            assert tier.sess.i >= per_rung * (len(rungs) - 1)
            await ws.close()

        loop.run_until_complete(asyncio.wait_for(run(), 300))
    finally:
        loop.run_until_complete(client.close())
        loop.close()


def test_serving_polish_runs_full_precision_tail():
    """After the ladder completes, a session with `polish: N` in its params
    (seeded from serve_polish) respawns the driver at polish_precision,
    runs N iterations warm-started from the bfloat16 iterate, then pauses;
    a user reset abandons the phase back to the main precision."""
    from style_transfer2_tpu.serve.app import init

    loop = asyncio.new_event_loop()
    asyncio.set_event_loop(loop)
    app = init(config=_config(serve_ladder=2, ladder_min_scale=24,
                              precision='bfloat16', serve_polish=2,
                              polish_precision='float32'))
    client = TestClient(TestServer(app), loop=loop)
    loop.run_until_complete(client.start_server())
    try:
        async def run():
            tier = app['tier']
            ws = await client.ws_connect('/websocket')
            await _recv_until(ws, 'newSize')
            await ws.send_str(json.dumps({'type': 'start'}))
            # Ladder climbs, then the polish tail runs and pauses the
            # session at the polish precision.
            for _ in range(1500):
                if (tier.ladder is None and tier.polish is None
                        and tier._precision_override == 'float32'
                        and not tier.sess.running):
                    break
                await asyncio.sleep(0.2)
            assert tier.ladder is None and tier.polish is None
            assert tier._precision_override == 'float32'
            assert not tier.sess.running        # polish done -> paused
            assert tier.driver.transfer.precision == 'float32'
            # The polish respawn carried the session's first-eval norms:
            # the full-precision tail CONTINUED the same normalized
            # objective instead of re-anchoring it at the bf16 iterate.
            assert tier.sess.norms is not None
            vals, set_ = tier.sess.norms
            eng = tier.driver.transfer
            assert set(vals) == set(eng.norm_vals)
            for k, v in vals.items():
                assert bool(eng.norm_set[k])
                assert np.isclose(float(eng.norm_vals[k]), v, rtol=1e-6), k
            # A user reset abandons the polished state: back to the main
            # precision (and the coarse-to-fine schedule restarts).
            await ws.send_str(json.dumps({'type': 'reset'}))
            for _ in range(300):
                if tier._precision_override is None:
                    break
                await asyncio.sleep(0.1)
            assert tier._precision_override is None
            assert tier.driver.transfer.precision == 'bfloat16'
            await ws.close()

        loop.run_until_complete(asyncio.wait_for(run(), 560))
    finally:
        loop.run_until_complete(client.close())
        loop.close()


def test_ladder_cancelled_by_user_resize():
    """A user-driven size change mid-ladder overrides the schedule."""
    from style_transfer2_tpu.serve.app import init

    loop = asyncio.new_event_loop()
    asyncio.set_event_loop(loop)
    app = init(config=_config(serve_ladder=1000,    # never advances on its own
                              ladder_min_scale=24))
    client = TestClient(TestServer(app), loop=loop)
    loop.run_until_complete(client.start_server())
    try:
        async def run():
            tier = app['tier']
            ws = await client.ws_connect('/websocket')
            await _recv_until(ws, 'newSize')
            await ws.send_str(json.dumps({'type': 'start'}))
            await _recv_until(ws, 'iterateInfo')
            assert tier.ladder is not None
            params = dict(tier.sess.params)
            params['size'] = 64
            await ws.send_str(json.dumps(
                {'type': 'applyParams',
                 'params': json.dumps(params)}))   # YAML superset
            await _recv_until(ws, 'newParams')
            assert tier.ladder is None
            await ws.close()

        loop.run_until_complete(asyncio.wait_for(run(), 300))
    finally:
        loop.run_until_complete(client.close())
        loop.close()

"""Schedule-state persistence: the serving tiers' coarse-to-fine ladder
and full-precision polish tail survive a full process restart (reference
analog: none — the reference loses ALL session state on an app restart;
this rebuild's persistence already restored the session, and these tests
pin that the automated schedules riding on it are restored too, so a
redeploy mid-ladder resumes climbing and a redeploy mid-polish resumes
the tail at the raised precision instead of silently abandoning it)."""

import asyncio
import configparser
import json

import aiohttp
import numpy as np
from aiohttp import WSMsgType
from aiohttp.test_utils import TestClient, TestServer

from test_pool import WSSession, _config as _pool_config


def _app_config(tmp_path, **extra):
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
        'persist_path': str(tmp_path / 'session.npz'),
        'persist_interval': '3600',   # only the cleanup write matters
        **{k: str(v) for k, v in extra.items()},
    }
    return cp['DEFAULT']


async def _recv_until(ws, wanted, limit=400):
    for _ in range(limit):
        msg = await asyncio.wait_for(ws.receive(), 240)
        assert msg.type == WSMsgType.TEXT, msg
        data = json.loads(msg.data)
        if data['type'] == wanted:
            return data
    raise AssertionError('never received %s' % wanted)


def test_app_restart_resumes_ladder(tmp_path):
    """A redeploy mid-ladder: the restored session still holds the
    schedule (same rungs, same position, REMAINING rung budget) and a
    start resumes the climb to the params-requested target."""
    from style_transfer2_tpu.serve.app import init
    config = _app_config(tmp_path, serve_ladder=8, ladder_min_scale=24)
    loop = asyncio.new_event_loop()
    asyncio.set_event_loop(loop)

    async def first_life():
        app = init(config=config)
        client = TestClient(TestServer(app))
        await client.start_server()
        tier = app['tier']
        ws = await client.ws_connect('/websocket')
        await _recv_until(ws, 'workerReady')
        await ws.send_str(json.dumps({'type': 'start'}))
        # Wait for the first rung advance, then PAUSE mid-ladder (a pause
        # is not a schedule-cancelling user action).
        for _ in range(600):
            lad = tier.ladder
            if lad is not None and lad['idx'] >= 1:
                break
            await asyncio.sleep(0.1)
        assert tier.ladder is not None and tier.ladder['idx'] >= 1
        await ws.send_str(json.dumps({'type': 'pause'}))
        for _ in range(100):
            if not tier.sess.running:
                break
            await asyncio.sleep(0.1)
        await ws.close()
        state = (list(map(tuple, tier.ladder['rungs'])),
                 tier.ladder['idx'], tier.sess.i)
        await client.close()   # on_cleanup persists session + schedule
        return state

    rungs, idx, i_before = loop.run_until_complete(
        asyncio.wait_for(first_life(), 300))
    assert (tmp_path / 'session.npz').exists()

    async def second_life():
        app = init(config=config)
        client = TestClient(TestServer(app))
        await client.start_server()
        tier = app['tier']
        lad = tier.ladder
        assert lad is not None, 'ladder not restored'
        assert list(map(tuple, lad['rungs'])) == rungs
        assert lad['idx'] >= idx - 1   # a mid-advance snapshot re-takes it
        assert tier.sess.i == i_before
        ws = await client.ws_connect('/websocket')
        await _recv_until(ws, 'workerReady')
        await ws.send_str(json.dumps({'type': 'start'}))
        # The climb resumes and completes at the target grid.
        for _ in range(1200):
            if (tier.ladder is None and tier.sess.input_arr is not None
                    and tuple(tier.sess.input_arr.shape[:2]) == rungs[-1]):
                break
            await asyncio.sleep(0.2)
        assert tier.ladder is None
        assert tuple(tier.sess.input_arr.shape[:2]) == rungs[-1]
        assert tier.sess.i > i_before   # continued numbering, not from 1
        await ws.close()
        await client.close()

    loop.run_until_complete(asyncio.wait_for(second_life(), 560))
    loop.close()


def test_app_restart_resumes_polish(tmp_path):
    """A redeploy mid-polish: the tier boots its driver at the persisted
    polish precision, the tail's REMAINING budget auto-resumes, completes,
    and pauses — and a further restart of the polished-and-paused session
    keeps the raised precision."""
    from style_transfer2_tpu.serve.app import init
    config = _app_config(tmp_path, serve_ladder=2, ladder_min_scale=24,
                         precision='bfloat16', serve_polish=200,
                         polish_precision='float32')
    loop = asyncio.new_event_loop()
    asyncio.set_event_loop(loop)

    async def first_life():
        app = init(config=config)
        client = TestClient(TestServer(app))
        await client.start_server()
        tier = app['tier']
        ws = await client.ws_connect('/websocket')
        await _recv_until(ws, 'workerReady')
        await ws.send_str(json.dumps({'type': 'start'}))
        # Ladder completes, the polish respawn lands; close mid-tail (the
        # 200-iteration budget keeps it active through the shutdown).
        for _ in range(1500):
            if tier.polish is not None and tier._precision_override:
                break
            await asyncio.sleep(0.2)
        assert tier.polish is not None
        assert tier._precision_override == 'float32'
        await ws.close()
        state = tier.sess.i
        await client.close()
        return state

    i_before = loop.run_until_complete(asyncio.wait_for(first_life(), 560))

    async def second_life():
        app = init(config=config)
        client = TestClient(TestServer(app))
        await client.start_server()
        tier = app['tier']
        assert tier._precision_override == 'float32'
        assert tier.polish is not None, 'polish tail not restored'
        assert tier.driver.transfer.precision == 'float32'
        # The tail auto-resumes (even if the snapshot caught the respawn
        # window where running was transiently False), completes its
        # remaining budget, and pauses.
        for _ in range(1500):
            if tier.polish is None and not tier.sess.running:
                break
            await asyncio.sleep(0.2)
        assert tier.polish is None
        assert not tier.sess.running
        assert tier._precision_override == 'float32'
        assert tier.sess.i > i_before
        await client.close()

    loop.run_until_complete(asyncio.wait_for(second_life(), 560))

    async def third_life():
        # Polished-and-paused: the raised precision survives too (no
        # active phase, just the override).
        app = init(config=config)
        client = TestClient(TestServer(app))
        await client.start_server()
        tier = app['tier']
        assert tier.polish is None and tier.ladder is None
        assert tier._precision_override == 'float32'
        assert tier.driver.transfer.precision == 'float32'
        assert not tier.sess.running
        await client.close()

    loop.run_until_complete(asyncio.wait_for(third_life(), 300))
    loop.close()


def test_app_restart_survives_malformed_phase_blob(tmp_path):
    """A corrupt/garbage phase entry restores the SESSION but no schedule
    — persistence must never take the service down (persist.py contract),
    and a lost schedule is just the pre-persistence behavior."""
    import yaml as _yaml
    from style_transfer2_tpu.serve import persist
    from style_transfer2_tpu.serve.app import init
    from test_persist import _populated_session

    config = _app_config(tmp_path, serve_ladder=4, ladder_min_scale=24)
    loop = asyncio.new_event_loop()
    asyncio.set_event_loop(loop)

    # Hand-craft a snapshot whose phase blob is structurally broken
    # (unknown precision, ladder idx out of range) on top of a valid
    # session.
    sess = _populated_session()
    sess.i = 7
    sess.running = False
    bad = _yaml.safe_dump({'ladder': {'rungs': [[24, 32]], 'idx': 99,
                                      'per_rung': 4, 'remaining': 2,
                                      'await_grid': None},
                           'precision_override': 'not-a-precision'})
    persist.save_session(tmp_path / 'session.npz', sess,
                         extra={'app_phase_yaml': np.str_(bad)})

    async def boot():
        app = init(config=config)
        client = TestClient(TestServer(app))
        await client.start_server()
        tier = app['tier']
        # Session restored; schedule dropped; boot healthy.
        assert tier.sess.i == 7
        assert tier.ladder is None and tier.polish is None
        assert tier._precision_override is None
        ws = await client.ws_connect('/websocket')
        await _recv_until(ws, 'workerReady')
        await ws.close()
        await client.close()

    loop.run_until_complete(asyncio.wait_for(boot(), 300))
    loop.close()


def test_pool_restart_resumes_ladder(tmp_path):
    """A pooled redeploy mid-ladder: the restored session still holds its
    schedule position and remaining rung budget, and resumes migrating up
    to the target bucket."""
    from style_transfer2_tpu.serve.pool import init

    config = _pool_config()
    config['initial_size'] = '48'
    config['pool_sizes'] = '24 32 48'
    config['serve_ladder'] = '6'
    config['pool_persist_dir'] = str(tmp_path / 'pool')
    config['persist_interval'] = '3600'
    loop = asyncio.new_event_loop()
    asyncio.set_event_loop(loop)

    async def first_life():
        app = init(config=config)
        client = TestClient(TestServer(app),
                            cookie_jar=aiohttp.DummyCookieJar())
        await client.start_server()
        tier = app['tier']
        a = await WSSession(client).open()
        await a.recv_until('state')
        sess = next(iter(tier.sessions.values()))
        await a.send({'type': 'start'})
        # Wait for the first rung advance (bucket 24 -> 32), then pause
        # mid-ladder (a pause is not a schedule-cancelling action).
        for _ in range(900):
            lad = sess.ladder
            if (lad is not None and lad['idx'] >= 1
                    and not lad.get('migrating')):
                break
            await asyncio.sleep(0.1)
        assert sess.ladder is not None and sess.ladder['idx'] >= 1
        await a.send({'type': 'pause'})
        for _ in range(100):
            if not sess.running:
                break
            await asyncio.sleep(0.1)
        await a.ws.close()
        state = (a.cookie, sess.ladder['rungs'], sess.i)
        await client.close()
        return state

    cookie, rungs, i_before = loop.run_until_complete(
        asyncio.wait_for(first_life(), 560))

    async def second_life():
        app = init(config=config)
        client = TestClient(TestServer(app),
                            cookie_jar=aiohttp.DummyCookieJar())
        await client.start_server()
        tier = app['tier']
        sess = tier.sessions[cookie]
        assert sess.ladder is not None, 'pooled ladder not restored'
        assert sess.ladder['rungs'] == rungs
        assert sess.i == i_before and not sess.running
        a = WSSession(client)
        a.cookie = cookie
        a.ws = await client.ws_connect('/websocket', headers=a._headers())
        await a.send({'type': 'start'})
        # The climb resumes and ends in the target bucket.
        for _ in range(1500):
            if sess.ladder is None and max(sess.bucket_hw) == rungs[-1]:
                break
            await asyncio.sleep(0.2)
        assert sess.ladder is None
        assert max(sess.bucket_hw) == rungs[-1]
        assert sess.i > i_before
        await a.ws.close()
        await client.close()

    loop.run_until_complete(asyncio.wait_for(second_life(), 560))
    loop.close()


def test_pool_restart_resumes_polish_tail(tmp_path):
    """A pooled redeploy mid-polish: the session restores into the
    (grid, polish-precision) bucket with the tail's remaining budget,
    resumes stepping, completes, and pauses."""
    from style_transfer2_tpu.serve.pool import init

    config = _pool_config()
    config['initial_size'] = '32'
    config['pool_sizes'] = '24 32'
    config['serve_ladder'] = '2'
    config['precision'] = 'bfloat16'
    config['serve_polish'] = '200'
    config['polish_precision'] = 'float32'
    config['pool_persist_dir'] = str(tmp_path / 'pool')
    config['persist_interval'] = '3600'
    loop = asyncio.new_event_loop()
    asyncio.set_event_loop(loop)

    async def first_life():
        app = init(config=config)
        client = TestClient(TestServer(app),
                            cookie_jar=aiohttp.DummyCookieJar())
        await client.start_server()
        tier = app['tier']
        a = await WSSession(client).open()
        await a.recv_until('state')
        sess = next(iter(tier.sessions.values()))
        await a.send({'type': 'start'})
        # Ladder 24 -> 32, then the cross-precision migration lands.
        for _ in range(1500):
            if (sess.precision == 'float32' and sess.polish is not None
                    and sess.polish.get('until_i') is not None):
                break
            await asyncio.sleep(0.2)
        assert sess.precision == 'float32'
        assert sess.polish is not None
        await a.ws.close()
        state = (a.cookie, sess.i, tuple(sess.bucket_hw))
        await client.close()
        return state

    cookie, i_before, hw = loop.run_until_complete(
        asyncio.wait_for(first_life(), 560))

    async def second_life():
        app = init(config=config)
        client = TestClient(TestServer(app),
                            cookie_jar=aiohttp.DummyCookieJar())
        await client.start_server()
        tier = app['tier']
        sess = tier.sessions[cookie]
        assert sess.precision == 'float32'
        assert tuple(sess.bucket_hw) == hw
        assert sess.polish is not None, 'polish tail not restored'
        assert tier.engine_of(sess).precision == 'float32'
        assert sess.i == i_before
        # The running tail resumes, spends its remaining budget, pauses.
        a = WSSession(client)
        a.cookie = cookie
        a.ws = await client.ws_connect('/websocket', headers=a._headers())
        for _ in range(1500):
            if sess.polish is None and not sess.running:
                break
            await asyncio.sleep(0.2)
        assert sess.polish is None
        assert not sess.running
        assert sess.precision == 'float32'
        assert sess.i > i_before
        await a.ws.close()
        await client.close()

    loop.run_until_complete(asyncio.wait_for(second_life(), 560))
    loop.close()

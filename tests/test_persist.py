"""Session persistence (serve/persist.py): snapshot/restore round-trips,
corruption tolerance, and the app tier surviving a full process restart
with only optimizer momentum lost — the reference's worker-restart
contract (app.py:336-344) extended across app restarts (the reference
itself loses everything when app.py dies)."""

import asyncio
import configparser
import json

import numpy as np
from aiohttp import WSMsgType
from aiohttp.test_utils import TestClient, TestServer
from PIL import Image
import yaml

from style_transfer2_tpu.serve import persist
from style_transfer2_tpu.serve import session as sn


def _populated_session(seed=0):
    rng = np.random.RandomState(seed)
    sess = sn.Session()
    sess.i = 37
    sess.running = True
    sess.input_was_reset = False
    sess.input_arr = rng.uniform(-20, 300, (24, 32, 3)).astype(np.float32)
    sess.set_slot_image('content', Image.fromarray(
        rng.randint(0, 256, (40, 50, 3)).astype(np.uint8)))
    sess.set_slot_image('style', Image.fromarray(
        rng.randint(0, 256, (30, 30, 3)).astype(np.uint8)))
    sess.style_size = '128'
    sess.params = {'size': 32, 'optimizer': 'adam',
                   'optimizer_step_size': 5,
                   'weights': [{'content': {'conv2_2': 0.1},
                                'style': {'conv1_1': 1.0},
                                'deepdream': {}},
                               {'p': 50.0, 'p_power': 6.0,
                                'tv': 5.0, 'tv_power': 2.0}]}
    return sess


def test_snapshot_roundtrip(tmp_path):
    path = tmp_path / 'session.npz'
    src = _populated_session()
    persist.save_session(path, src)

    dst = sn.Session()
    assert persist.load_session(path, dst)
    assert dst.i == 37 and dst.running and not dst.input_was_reset
    assert dst.style_size == '128'
    assert dst.params == src.params
    np.testing.assert_array_equal(dst.input_arr, src.input_arr)
    assert dst.input_arr.dtype == np.float32
    np.testing.assert_array_equal(np.asarray(dst.content_image),
                                  np.asarray(src.content_image))
    np.testing.assert_array_equal(np.asarray(dst.style_image),
                                  np.asarray(src.style_image))
    # Restored signature matches the saved state's (idle-skip detector).
    assert persist.signature(dst)[:-1] == persist.signature(src)[:-1]


def test_load_missing_or_corrupt(tmp_path):
    sess = _populated_session()
    before = persist.signature(sess)
    assert not persist.load_session(tmp_path / 'nope.npz', sess)
    corrupt = tmp_path / 'bad.npz'
    corrupt.write_bytes(b'not an npz at all')
    assert not persist.load_session(corrupt, sess)
    truncated = tmp_path / 'trunc.npz'
    persist.save_session(truncated, sess)
    truncated.write_bytes(truncated.read_bytes()[:40])
    assert not persist.load_session(truncated, sess)
    assert persist.signature(sess) == before   # untouched on failure


def test_future_schema_rejected(tmp_path):
    path = tmp_path / 'future.npz'
    sess = _populated_session()
    data = persist.snapshot(sess)
    data['version'] = np.int64(persist.SCHEMA_VERSION + 1)
    with open(path, 'wb') as f:
        np.savez(f, **data)
    assert not persist.load_session(path, sn.Session())


def test_signature_tracks_changes():
    sess = _populated_session()
    sig = persist.signature(sess)
    assert persist.signature(sess) == sig
    sess.i += 1
    sig2 = persist.signature(sess)
    assert sig2 != sig
    sess.input_arr = sess.input_arr + 1.0
    assert persist.signature(sess) != sig2


# -- App tier end-to-end: restart resumes ------------------------------------


def _persist_config(tmp_path):
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
        'persist_interval': '3600',   # only the cleanup write matters here
    }
    return cp['DEFAULT']


async def _recv_until(ws, wanted, limit=300):
    for _ in range(limit):
        msg = await asyncio.wait_for(ws.receive(), 240)
        assert msg.type == WSMsgType.TEXT, msg
        data = json.loads(msg.data)
        if data['type'] == wanted:
            return data
    raise AssertionError('never received %s' % wanted)


def test_app_restart_resumes(tmp_path):
    from style_transfer2_tpu.serve.app import init
    config = _persist_config(tmp_path)
    loop = asyncio.new_event_loop()
    asyncio.set_event_loop(loop)

    async def first_life():
        app = init(config=config)
        client = TestClient(TestServer(app))
        await client.start_server()
        ws = await client.ws_connect('/websocket')
        await _recv_until(ws, 'workerReady')
        # Switch the optimizer so restore must honor the params document.
        params = yaml.safe_load(app['tier'].sess.params_yaml())
        params['optimizer'] = 'adam'
        params['optimizer_step_size'] = 5
        await ws.send_str(json.dumps({'type': 'applyParams',
                                      'params': yaml.safe_dump(params)}))
        await _recv_until(ws, 'newParams')
        await ws.send_str(json.dumps({'type': 'start'}))
        info = await _recv_until(ws, 'iterateInfo')
        while info['i'] < 3:
            info = await _recv_until(ws, 'iterateInfo')
        await ws.close()
        tier = app['tier']
        state = (tier.sess.i, np.array(tier.sess.input_arr))
        await client.close()   # on_cleanup persists the final state
        return state

    i_before, input_before = loop.run_until_complete(
        asyncio.wait_for(first_life(), 300))
    assert i_before >= 3
    assert (tmp_path / 'session.npz').exists()

    async def second_life():
        app = init(config=config)
        client = TestClient(TestServer(app))
        await client.start_server()
        tier = app['tier']
        # Restored host state: counter, iterate, params, auto-resume.
        assert tier.sess.i == i_before
        assert tier.sess.params['optimizer'] == 'adam'
        np.testing.assert_array_equal(tier.sess.input_arr, input_before)
        assert tier.sess.running
        ws = await client.ws_connect('/websocket')
        await _recv_until(ws, 'workerReady')
        # Iteration continues the user's numbering, not from 1.
        info = await _recv_until(ws, 'iterateInfo')
        assert info['i'] > i_before
        assert np.isfinite(info['trace']['loss'])
        # The engine really is running the restored optimizer.
        assert tier.driver.transfer.optimizer_name == 'adam'
        await ws.close()
        await client.close()

    loop.run_until_complete(asyncio.wait_for(second_life(), 300))
    loop.close()


# -- Pooled tier: all sessions survive a redeploy ----------------------------


def test_pool_restart_resumes(tmp_path):
    """Every cookie session of a pooled instance survives a full process
    restart: lanes re-claim, counters and images persist, running lanes
    resume, paused lanes stay paused (reference analog: none — a pooled
    redeploy dropped every user)."""
    from style_transfer2_tpu.serve.pool import init
    import aiohttp
    from test_pool import WSSession, _config

    config = _config()
    config['pool_persist_dir'] = str(tmp_path / 'pool')
    config['persist_interval'] = '3600'   # only the cleanup write matters
    loop = asyncio.new_event_loop()
    asyncio.set_event_loop(loop)

    async def first_life():
        app = init(config=config)
        client = TestClient(TestServer(app),
                            cookie_jar=aiohttp.DummyCookieJar())
        await client.start_server()
        a = await WSSession(client).open()
        b = await WSSession(client).open()
        await a.recv_until('state')
        await b.recv_until('state')
        await a.send({'type': 'start'})
        info = await a.recv_until('iterateInfo')
        while info['i'] < 3:
            info = await a.recv_until('iterateInfo')
        await a.ws.close()
        await b.ws.close()
        tier = app['tier']
        sess_a = tier.sessions[a.cookie]
        state = (a.cookie, b.cookie, sess_a.i, np.array(sess_a.input_arr))
        await client.close()   # on_cleanup persists every session
        return state

    cookie_a, cookie_b, i_a, input_a = loop.run_until_complete(
        asyncio.wait_for(first_life(), 300))
    assert i_a >= 3
    assert len(list((tmp_path / 'pool').glob('*.npz'))) == 2

    async def second_life():
        app = init(config=config)
        client = TestClient(TestServer(app),
                            cookie_jar=aiohttp.DummyCookieJar())
        await client.start_server()
        tier = app['tier']
        assert set(tier.sessions) == {cookie_a, cookie_b}
        sess_a, sess_b = tier.sessions[cookie_a], tier.sessions[cookie_b]
        assert sess_a.i == i_a and sess_a.running
        assert sess_b.i == 0 and not sess_b.running
        np.testing.assert_allclose(np.float32(sess_a.input_arr),
                                   np.float32(input_a), atol=1e-4)
        # The returning browser's cookie lands on its old session and the
        # lane keeps iterating with continued numbering.
        a = WSSession(client)
        a.cookie = cookie_a
        a.ws = await client.ws_connect('/websocket', headers=a._headers())
        info = await a.recv_until('iterateInfo')
        assert info['i'] > i_a
        assert np.isfinite(info['trace']['loss'])
        # Releasing a session deletes its snapshot.
        await a.ws.close()
        await tier.engine_op(tier.release, sess_b)
        assert not (tmp_path / 'pool' / (cookie_b + '.npz')).exists()
        await client.close()

    loop.run_until_complete(asyncio.wait_for(second_life(), 300))
    loop.close()

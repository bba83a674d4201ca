"""Serving-tier tests (SURVEY.md §4.3/4.5): the driver message protocol with
the real engine on CPU, and the full aiohttp app end-to-end — upload ->
start -> iterateInfo -> /output — plus the router registry/affinity logic."""

import asyncio
import base64
import configparser
import io
import json

import numpy as np
import pytest
from aiohttp import WSMsgType
from aiohttp.test_utils import TestClient, TestServer
from PIL import Image

from style_transfer2_tpu.models import random_params
from style_transfer2_tpu.serve import messages as m
from style_transfer2_tpu.serve.driver import Driver


def run(coro, timeout=300):
    return asyncio.run(asyncio.wait_for(coro, timeout))


def _image_bytes(size=(32, 32), seed=0, fmt='png'):
    rng = np.random.RandomState(seed)
    img = Image.fromarray(rng.randint(0, 256, size + (3,)).astype(np.uint8))
    buf = io.BytesIO()
    img.save(buf, format=fmt)
    return buf.getvalue()


def _data_url(size=(32, 32), seed=0):
    return ('data:image/png;base64,'
            + base64.b64encode(_image_bytes(size, seed)).decode())


WEIGHTS = {'content': {'conv2_2': 0.1},
           'style': {'conv1_1': 1.0, 'conv2_1': 1.0},
           'deepdream': {}}
SCALARS = {'p': 50.0, 'p_power': 6.0, 'tv': 5.0, 'tv_power': 2.0}


# -- Driver protocol tests (reference §3.1/3.2 handshakes) --------------------

async def _drain_until(driver, msg_type, limit=50):
    for _ in range(limit):
        msg = await asyncio.wait_for(driver.out_queue.get(), 240)
        if isinstance(msg, msg_type):
            return msg
    raise AssertionError('no %s received' % msg_type.__name__)


def test_driver_bootstrap_handshake():
    """StartIteration with empty slots must answer GetImages; after the app
    re-sends the images, iteration proceeds (worker.py:399-401)."""
    async def body():
        driver = Driver(random_params(0))
        task = asyncio.ensure_future(driver.run())

        ready = await _drain_until(driver, m.WorkerReady)
        assert 'conv5_4' in ready.layers and 'data' in ready.layers

        await driver.in_queue.put(m.StartIteration())
        await _drain_until(driver, m.GetImages)

        rng = np.random.RandomState(0)
        content = rng.randint(0, 256, (24, 24, 3)).astype(np.uint8)
        style = rng.randint(0, 256, (24, 24, 3)).astype(np.uint8)
        inp = rng.randint(0, 256, (24, 24, 3)).astype(np.uint8)
        await driver.in_queue.put(m.SetWeights(WEIGHTS, SCALARS))
        await driver.in_queue.put(m.SetImages(None, inp, content, style, True))
        await driver.in_queue.put(m.SetOptimizer('adam'))
        await driver.in_queue.put(m.StartIteration())

        it = await _drain_until(driver, m.Iterate)
        assert it.i == 1
        assert np.isfinite(it.trace['loss'])
        assert it.image.shape == (24, 24, 3)

        it2 = await _drain_until(driver, m.Iterate)
        assert it2.i == 2

        await driver.in_queue.put(m.PauseIteration())
        await driver.in_queue.put(m.Shutdown())
        await _drain_until(driver, m.Shutdown)
        await task
    run(body())


def test_driver_pause_and_weight_change():
    async def body():
        driver = Driver(random_params(0))
        task = asyncio.ensure_future(driver.run())
        await _drain_until(driver, m.WorkerReady)

        rng = np.random.RandomState(1)
        imgs = [rng.randint(0, 256, (24, 24, 3)).astype(np.uint8)
                for _ in range(3)]
        await driver.in_queue.put(m.SetWeights(WEIGHTS, SCALARS))
        await driver.in_queue.put(m.SetImages(None, *imgs, False))
        await driver.in_queue.put(m.SetOptimizer('adam'))
        await driver.in_queue.put(m.StartIteration())
        await _drain_until(driver, m.Iterate)

        # Pause: no more Iterates after the queue drains.
        await driver.in_queue.put(m.PauseIteration())
        await asyncio.sleep(0.3)
        while not driver.out_queue.empty():
            driver.out_queue.get_nowait()
        assert not driver.transfer.is_running

        # Weight change applies and iteration resumes.
        new_weights = {'content': {'conv2_2': 0.5},
                       'style': {'conv1_1': 2.0}, 'deepdream': {}}
        await driver.in_queue.put(m.SetWeights(new_weights, SCALARS))
        await driver.in_queue.put(m.StartIteration())
        it = await _drain_until(driver, m.Iterate)
        assert it.trace['fevals'] > 0
        assert driver.transfer.weights['content']['conv2_2'] == 0.5

        await driver.in_queue.put(m.Shutdown())
        await task
    run(body())


def test_driver_prewarm_runs_alongside_iteration():
    """A driver with prewarm_grids compiles them in the background while
    the live session iterates: the prewarm task finishes, the live grid is
    skipped, and Iterates keep flowing throughout."""
    async def body():
        driver = Driver(random_params(0), prewarm_grids=[(24, 24), (16, 16)])
        task = asyncio.ensure_future(driver.run())
        await _drain_until(driver, m.WorkerReady)

        rng = np.random.RandomState(2)
        imgs = [rng.randint(0, 256, (24, 24, 3)).astype(np.uint8)
                for _ in range(3)]
        await driver.in_queue.put(m.SetWeights(WEIGHTS, SCALARS))
        await driver.in_queue.put(m.SetImages(None, *imgs, False))
        await driver.in_queue.put(m.SetOptimizer('adam'))
        await driver.in_queue.put(m.StartIteration())
        await _drain_until(driver, m.Iterate)

        assert driver._prewarm_task is not None
        await asyncio.wait_for(driver._prewarm_task, 240)
        # Iteration still live after the prewarm completes.
        it = await _drain_until(driver, m.Iterate)
        assert np.isfinite(it.trace['loss'])
        # The prewarmed grid's programs are now cached: a resize to it
        # steps without error.
        # The session free-ran during the prewarm: clear the backlog of
        # stale 24px Iterates before asserting on the resized stream.
        while not driver.out_queue.empty():
            driver.out_queue.get_nowait()
        await driver.in_queue.put(m.SetImages(
            (16, 16), m.SetImages.RESAMPLE, m.SetImages.RESAMPLE, None, False))
        for _ in range(50):  # a few pre-resize Iterates may still arrive
            it = await _drain_until(driver, m.Iterate)
            if it.image is not None and it.image.shape == (16, 16, 3):
                break
        else:
            raise AssertionError('no resized Iterate received')

        await driver.in_queue.put(m.Shutdown())
        await task
    run(body())


def test_adaptive_tuner_math():
    """AdaptiveTuner calibrates step/RTT from unpipelined differentials
    (plan() IS the measurement schedule), sizes chunks to the latency
    target net of the collect RTT, snaps to the compile ladder, and drops
    pipelining when a sub-chunk's compute can't cover the measured RTT
    (the round-2 rule)."""
    from style_transfer2_tpu.serve.driver import AdaptiveTuner

    t = AdaptiveTuner(2.0)
    t.note_grid((300, 300))
    assert t.plan(30, 2) == (1, 1)       # calibration: single-step wall
    t.note_single_wall(90.0)             # first run: compile — discarded
    t.note_single_wall(0.46)             # rtt 0.45 + 10 ms step
    assert t.plan(30, 2) == (30, 1)      # calibration: unpipelined chunk
    t.note_chunk_wall(30, 90.0)          # first (grid,30) run — discarded
    t.note_chunk_wall(30, 0.75)          # rtt 0.45 + 30 x 10 ms
    assert abs(t.step_s - 0.01) < 1e-9   # (0.75 - 0.46) / 29
    assert abs(t.rtt_s - 0.45) < 1e-9    # 0.46 - step
    # Budget = 2 s - 0.45 s RTT = 1.55 s / 10 ms = 155 in flight;
    # 77/sub-chunk -> ladder 60; 0.6 s compute > 0.45 s RTT: depth 2.
    assert t.plan(30, 2) == (60, 2)

    # Resolution change: step estimate resets (grid-bound), RTT persists
    # (link-bound) — recalibration needs only one unpipelined chunk.
    t.note_grid((2048, 2048))
    assert t.step_s is None and t.rtt_s is not None
    assert t.plan(30, 2) == (30, 1)
    t.note_chunk_wall(30, 120.0)         # new grid's compile — discarded
    t.note_chunk_wall(30, 6.45)          # rtt 0.45 + 30 x 200 ms
    assert abs(t.step_s - 0.2) < 1e-6
    # Budget 1.55 s / 200 ms = 7; 3/sub-chunk -> ladder 2; 0.4 s <= RTT:
    # pipelining loses -> one unpipelined chunk of the full budget.
    assert t.plan(30, 2) == (4, 1)

    # Tight target + slow link: the RTT floor (a quarter of the target)
    # keeps chunks sane instead of collapsing toward 1-step dispatches.
    t2 = AdaptiveTuner(0.5)
    t2.note_grid((256, 256))
    assert t2.plan(30, 2) == (1, 1)
    t2.note_single_wall(90.0)            # compile — discarded
    t2.note_single_wall(0.46)
    assert t2.plan(30, 2) == (30, 1)
    t2.note_chunk_wall(30, 90.0)         # compile — discarded
    t2.note_chunk_wall(30, 0.75)
    assert t2.plan(30, 2) == (8, 1)      # 0.125 s floor / 10 ms -> 12 -> 8


def test_adaptive_tuner_rtt_never_contaminates_step():
    """Regression for the round-3 hardware spiral: on a slow link with
    small chunks, pipelined collect intervals measure the collect RTT,
    not compute. Those samples must be rejected (step_s unchanged, plan
    stable), and persistent rejection must trigger recalibration via an
    unpipelined chunk rather than trusting poisoned samples."""
    from style_transfer2_tpu.serve.driver import AdaptiveTuner

    t = AdaptiveTuner(2.0)
    t.note_grid((300, 300))
    t.note_single_wall(90.0)
    t.note_single_wall(1.805)            # rtt 1.8 + 5 ms step
    t.note_chunk_wall(30, 90.0)
    t.note_chunk_wall(30, 1.95)          # rtt 1.8 + 30 x 5 ms
    assert abs(t.step_s - 0.005) < 1e-9
    assert abs(t.rtt_s - 1.8) < 1e-9
    plan0 = t.plan(30, 2)
    assert plan0[0] >= 60                # big chunks despite the slow link

    # Device-idle gaps (~RTT) arrive as 'intervals': every one rejected.
    t.note_chunk_interval(plan0[0], 1.8)  # first (grid, k): compile discard
    for _ in range(AdaptiveTuner.MAX_INTERVAL_REJECTS - 1):
        t.note_chunk_interval(plan0[0], 1.8)
        assert abs(t.step_s - 0.005) < 1e-9
        assert t.plan(30, 2) == plan0    # no spiral
    # The next rejection trips the self-heal: recalibrate, don't trust.
    t.note_chunk_interval(plan0[0], 1.8)
    assert t.plan(30, 2) == (30, 1)      # back to an unpipelined chunk
    t.note_chunk_wall(30, 1.95)
    assert abs(t.step_s - 0.005) < 1e-9  # recalibration confirms it
    assert t.plan(30, 2) == plan0

    # Genuine drift (interval consistent with the estimate) still tracks.
    before = t.step_s
    t.note_chunk_interval(plan0[0], plan0[0] * 0.006)
    assert t.step_s > before

    # Symmetric band (ADVICE r3): a spuriously SHORT interval — e.g.
    # back-to-back collects after a queue stall — must not drag step_s
    # down and balloon planned chunks past the latency target.
    before = t.step_s
    plan_before = t.plan(30, 2)
    t.note_chunk_interval(plan0[0], plan0[0] * before / 10.0)
    assert t.step_s == before            # rejected, not averaged
    assert t.plan(30, 2) == plan_before
    # ... and short-side rejections count toward the self-heal too.
    for _ in range(AdaptiveTuner.MAX_INTERVAL_REJECTS):
        t.note_chunk_interval(plan0[0], plan0[0] * before / 10.0)
    assert t.plan(30, 2) == (30, 1)      # recalibration chunk


def test_driver_latency_target_tunes_live():
    """A driver with adaptive_latency_target measures step time from its
    own dispatch stream and keeps iterating; the tuner's estimates
    populate and its plan stays on the compile ladder."""
    async def body():
        driver = Driver(random_params(0), adaptive_max_steps=6,
                        pipeline_depth=2, adaptive_latency_target=0.5)
        assert driver.tuner is not None
        task = asyncio.ensure_future(driver.run())
        await _drain_until(driver, m.WorkerReady)

        rng = np.random.RandomState(3)
        imgs = [rng.randint(0, 256, (24, 24, 3)).astype(np.uint8)
                for _ in range(3)]
        await driver.in_queue.put(m.SetWeights(WEIGHTS, SCALARS))
        await driver.in_queue.put(m.SetImages(None, *imgs, False))
        await driver.in_queue.put(m.SetOptimizer('adam'))
        await driver.in_queue.put(m.StartIteration())
        last = None
        for _ in range(40):
            last = await _drain_until(driver, m.Iterate)
        assert np.isfinite(last.trace['loss'])
        assert driver.tuner.step_s is not None and driver.tuner.step_s > 0
        k, depth = driver.tuner.plan(3, 2)
        from style_transfer2_tpu.serve.driver import AdaptiveTuner
        assert k in AdaptiveTuner.LADDER and depth in (1, 2)

        await driver.in_queue.put(m.Shutdown())
        await task
    run(body())


def test_prewarm_grids_from_config():
    """_prewarm_grids snaps each configured size through the live resize
    pipeline at the content image's aspect ratio, deduplicated."""
    from style_transfer2_tpu.serve.app import SingleSessionTier
    cp = configparser.ConfigParser()
    cp['DEFAULT'] = {'prewarm_sizes': '48, 64, 48', 'http_host': '127.0.0.1',
                     'http_port': '8000'}
    tier = SingleSessionTier(cp['DEFAULT'])
    assert tier._prewarm_grids() == []  # no content image yet
    tier.sess.content_image = Image.fromarray(
        np.zeros((50, 100, 3), np.uint8))
    assert tier._prewarm_grids() == [(24, 48), (32, 64)]


def test_config_remat_reaches_engine():
    """The serving tier's `remat` config key must reach the engine (high-res
    sessions need the checkpointing policy), and bad values must be rejected
    at driver spawn rather than at first compile."""
    from style_transfer2_tpu.serve.app import SingleSessionTier

    async def body():
        cp = configparser.ConfigParser()
        cp['DEFAULT'] = {'remat': 'block', 'http_host': '127.0.0.1',
                         'http_port': '8000'}
        tier = SingleSessionTier(cp['DEFAULT'])
        tier.model_params = random_params(0)
        tier._spawn_driver()
        try:
            assert tier.driver.transfer.remat == 'block'
        finally:
            await tier.driver.in_queue.put(m.Shutdown())
            await tier.driver_task
            tier.pump_task.cancel()

        cp['DEFAULT']['remat'] = 'everything'
        with pytest.raises(ValueError):
            tier._spawn_driver()
    run(body())


# -- Full web-app E2E ----------------------------------------------------------

def _test_config(tmp_path):
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
    }
    return cp['DEFAULT']


@pytest.fixture
def app_client(tmp_path):
    from style_transfer2_tpu.serve.app import init
    loop = asyncio.new_event_loop()
    asyncio.set_event_loop(loop)
    app = init(config=_test_config(tmp_path))
    client = TestClient(TestServer(app), loop=loop)
    loop.run_until_complete(client.start_server())
    yield client, loop
    loop.run_until_complete(client.close())
    loop.close()


def test_app_end_to_end(app_client):
    client, loop = app_client

    async def body():
        # Index page renders with the params UI.
        resp = await client.get('/')
        assert resp.status == 200
        html = await resp.text()
        assert 'Style Transfer' in html and 'params' in html

        # Static assets are served.
        resp = await client.get('/app.js')
        assert resp.status == 200

        # /output returns a valid PNG of the initial random input.
        resp = await client.get('/output')
        assert resp.status == 200
        img = Image.open(io.BytesIO(await resp.read()))
        assert img.size[0] <= 48 and img.size[1] <= 48

        # WebSocket: initial state + start -> iterateInfo frames.
        ws = await client.ws_connect('/websocket')
        got = {}
        async def recv_until(wanted, limit=200):
            for _ in range(limit):
                msg = await asyncio.wait_for(ws.receive(), 240)
                assert msg.type == WSMsgType.TEXT, msg
                data = json.loads(msg.data)
                got[data['type']] = data
                if data['type'] == wanted:
                    return data
            raise AssertionError('never received %s (got %s)'
                                 % (wanted, list(got)))

        await recv_until('workerReady')
        await recv_until('state')
        assert 'newParams' in got and 'newSize' in got

        await ws.send_str(json.dumps({'type': 'start'}))
        info = await recv_until('iterateInfo')
        assert info['i'] >= 1
        assert np.isfinite(info['trace']['loss'])
        assert 'itsPerS' in info and 'stepSize' in info

        # Mid-run params change round-trips and echoes newParams (no error).
        params_doc = got['newParams']['params']
        import yaml as _yaml
        params = _yaml.safe_load(params_doc)
        params['optimizer'] = 'adam'
        params['optimizer_step_size'] = 5
        params['weights'][0]['style']['conv2_1'] = 2.0
        got.pop('newParams')
        await ws.send_str(json.dumps({'type': 'applyParams',
                                      'params': _yaml.safe_dump(params)}))
        new_params = await recv_until('newParams')
        assert new_params['errorString'] == ''

        # Invalid layer name is rejected with a readable error.
        bad = dict(params)
        bad['weights'] = [{'content': {'nope_1': 1}, 'style': {},
                           'deepdream': {}}, params['weights'][1]]
        await ws.send_str(json.dumps({'type': 'applyParams',
                                      'params': _yaml.safe_dump(bad)}))
        new_params = await recv_until('newParams')
        assert 'Invalid layer name' in new_params['errorString']

        # Pause stops the run.
        await ws.send_str(json.dumps({'type': 'pause'}))
        state = await recv_until('state')
        assert state['running'] is False

        # Upload a content image: triggers newSize + thumbnails.
        got.pop('thumbnails', None)
        resp = await client.post('/upload', data={
            'size': '48', 'slot': 'content', 'data': _data_url((40, 40), 7)})
        assert resp.status == 200
        await recv_until('thumbnails')

        # Reset produces a fresh random input.
        await ws.send_str(json.dumps({'type': 'reset'}))
        await asyncio.sleep(0.2)

        await ws.close()
    loop.run_until_complete(asyncio.wait_for(body(), 300))


def test_app_restart_worker_recovers(app_client):
    client, loop = app_client

    async def body():
        ws = await client.ws_connect('/websocket')

        async def recv_until(wanted, limit=300):
            for _ in range(limit):
                msg = await asyncio.wait_for(ws.receive(), 240)
                data = json.loads(msg.data)
                if data['type'] == wanted:
                    return data
            raise AssertionError('never received %s' % wanted)

        await recv_until('workerReady')
        # Kill the worker (fault injection, reference app.py:146-149); the
        # supervisor must respawn it and it must come back ready.
        await ws.send_str(json.dumps({'type': 'restartWorker'}))
        await recv_until('workerReady')

        # And it still iterates after recovery.
        await ws.send_str(json.dumps({'type': 'start'}))
        info = await recv_until('iterateInfo')
        assert np.isfinite(info['trace']['loss'])
        await ws.close()
    loop.run_until_complete(asyncio.wait_for(body(), 300))


# -- Router registry/affinity --------------------------------------------------

def test_router_registry_and_expiry(tmp_path):
    from style_transfer2_tpu.serve import router as router_mod

    async def body():
        config = configparser.ConfigParser()
        config['DEFAULT'] = {'router_session_timeout': '1'}
        app = router_mod.init(config=config['DEFAULT'],
                              state_file=str(tmp_path / 'state.json'))
        app['addrs'] = {}
        app['sessions'] = {}

        # Register two instances via the control plane.
        control = router_mod.make_control_app(app)
        client = TestClient(TestServer(control))
        await client.start_server()
        for i in range(2):
            resp = await client.post('/__register', json={
                'addr': 'http://127.0.0.1:90%02d/__control/reset' % i,
                'host': '127.0.0.1', 'port': 9000 + i, 'app_id': 'id%d' % i})
            assert resp.status == 200
        assert len(app['addrs']) == 2

        # Heartbeat from a known instance only refreshes last_ping.
        inst = list(app['addrs'].values())[0]
        old_ping = inst.last_ping
        await asyncio.sleep(0.02)
        await client.post('/__register', json={
            'addr': inst.addr, 'host': inst.host, 'port': inst.port,
            'app_id': inst.app_id})
        assert inst.last_ping > old_ping
        assert len(app['addrs']) == 2

        # Session assignment: fills lanes, 503 when exhausted.
        for instance in app['addrs'].values():
            instance.touch('taken-%s' % instance.app_id)
        app['sessions']['taken-%s' % inst.app_id] = inst

        # Expiry: stale ping evicts the instance.
        import time
        for instance in app['addrs'].values():
            instance.last_ping = time.monotonic() - 999
            for sid in instance.sessions:
                instance.sessions[sid] = time.monotonic() - 999
        await router_mod.expire_state(app, run_once=True)
        assert len(app['addrs']) == 1  # one eviction per sweep
        await router_mod.expire_state(app, run_once=True)
        assert len(app['addrs']) == 0

        # Unregister is idempotent.
        resp = await client.post('/__unregister', json={'app_id': 'id0'})
        assert resp.status == 200
        await client.close()

        # State persists and reloads.
        app['addrs']['a'] = router_mod.AppInstance(
            'http://x/__control/reset', 'h', 1, 'idz')
        router_mod.save_state(app)
        app2 = {'addrs': {}, 'sessions': {},
                'state_file': str(tmp_path / 'state.json')}
        router_mod.load_state(app2)
        assert 'http://x/__control/reset' in app2['addrs']
    run(body())


def test_app_control_reset_and_input_upload(app_client):
    """The router-facing control reset endpoint and the 'input'/'style'
    upload slots."""
    client, loop = app_client

    async def body():
        ws = await client.ws_connect('/websocket')
        got = {}

        async def recv_until(wanted, limit=300):
            for _ in range(limit):
                msg = await asyncio.wait_for(ws.receive(), 240)
                data = json.loads(msg.data)
                got[data['type']] = data
                if data['type'] == wanted:
                    return data
            raise AssertionError('never received %s' % wanted)

        await recv_until('workerReady')

        # Upload into the 'input' slot: replaces the iterate at its size.
        resp = await client.post('/upload', data={
            'size': '48', 'slot': 'input', 'data': _data_url((48, 48), 9)})
        assert resp.status == 200
        # And the 'style' slot: thumbnails broadcast.
        got.pop('thumbnails', None)
        resp = await client.post('/upload', data={
            'size': '48', 'slot': 'style', 'data': _data_url((30, 30), 4)})
        assert resp.status == 200
        await recv_until('thumbnails')

        # Router-driven session reset over the HTTP control plane: app
        # pauses, state reinitializes, clients get a state broadcast.
        await ws.send_str(json.dumps({'type': 'start'}))
        await recv_until('iterateInfo')
        got.pop('state', None)
        resp = await client.post('/__control/reset')
        assert resp.status == 200
        state = await recv_until('state')
        assert state['running'] is False
        await ws.close()
    loop.run_until_complete(asyncio.wait_for(body(), 300))


def test_driver_fused_dispatch_emits_per_iteration():
    """steps_per_dispatch > 1: the driver fuses K steps per dispatch and
    still emits one Iterate per iteration with consecutive indices."""
    async def body():
        driver = Driver(random_params(0), steps_per_dispatch=3)
        task = asyncio.ensure_future(driver.run())
        await _drain_until(driver, m.WorkerReady)
        rng = np.random.RandomState(2)
        imgs = [rng.randint(0, 256, (24, 24, 3)).astype(np.uint8)
                for _ in range(3)]
        await driver.in_queue.put(m.SetWeights(WEIGHTS, SCALARS))
        await driver.in_queue.put(m.SetImages(None, *imgs, False))
        await driver.in_queue.put(m.SetOptimizer('adam'))
        await driver.in_queue.put(m.StartIteration())
        seen = []
        for _ in range(6):
            it = await _drain_until(driver, m.Iterate)
            seen.append(it.i)
            assert np.isfinite(it.trace['loss'])
        assert seen == [1, 2, 3, 4, 5, 6]
        await driver.in_queue.put(m.Shutdown())
        await task
    run(body())


def test_router_capacity_aware_assignment(tmp_path):
    """A pooled instance registering with capacity N receives up to N
    sessions from the router; capacity-1 instances stay single-session."""
    from style_transfer2_tpu.serve import router as router_mod

    async def body():
        config = configparser.ConfigParser()
        config['DEFAULT'] = {'router_session_timeout': '60'}
        app = router_mod.init(config=config['DEFAULT'],
                              state_file=str(tmp_path / 'state.json'))
        app['addrs'] = {}
        app['sessions'] = {}

        control = router_mod.make_control_app(app)
        client = TestClient(TestServer(control))
        await client.start_server()
        resp = await client.post('/__register', json={
            'addr': 'http://127.0.0.1:9100/__control/reset',
            'host': '127.0.0.1', 'port': 9100, 'app_id': 'pool1',
            'capacity': 3})
        assert resp.status == 200
        inst = app['addrs']['http://127.0.0.1:9100/__control/reset']
        assert inst.capacity == 3
        assert inst.has_room()

        # Three sessions fit, the fourth is rejected.
        for k in range(3):
            inst.touch('s%d' % k)
            app['sessions']['s%d' % k] = inst
        assert not inst.has_room()

        # Persistence round-trips capacity and sessions.
        router_mod.save_state(app)
        app2 = {'addrs': {}, 'sessions': {},
                'state_file': str(tmp_path / 'state.json')}
        router_mod.load_state(app2)
        inst2 = app2['addrs']['http://127.0.0.1:9100/__control/reset']
        assert inst2.capacity == 3
        assert set(inst2.sessions) == {'s0', 's1', 's2'}
        assert set(app2['sessions']) == {'s0', 's1', 's2'}
        await client.close()
    run(body())


def test_size_snap(tmp_path):
    """size_snap quantizes user resizes so the compile cache stays hot."""
    from style_transfer2_tpu.serve.app import _snap_size

    class FakeApp(dict):
        pass

    import configparser
    cp = configparser.ConfigParser()
    cp['DEFAULT'] = {'size_snap': '64'}
    app = FakeApp(config=cp['DEFAULT'])
    assert _snap_size(app, 300) == 320
    assert _snap_size(app, 64) == 64
    assert _snap_size(app, 10) == 64   # never below one snap unit
    assert _snap_size(app, '500') == 512

    cp['DEFAULT'] = {'size_snap': '0'}
    app = FakeApp(config=cp['DEFAULT'])
    assert _snap_size(app, 300) == 300  # off = reference behavior


def test_driver_image_throttling():
    """image_every=3: iterate 1 and every 3rd iterate carry an image, the
    rest stream trace-only; a reset still recovers (first post-reset iterate
    has an image so the input_was_reset guard clears)."""
    async def body():
        driver = Driver(random_params(0), image_every=3)
        task = asyncio.ensure_future(driver.run())
        await _drain_until(driver, m.WorkerReady)
        rng = np.random.RandomState(3)
        imgs = [rng.randint(0, 256, (24, 24, 3)).astype(np.uint8)
                for _ in range(3)]
        await driver.in_queue.put(m.SetWeights(WEIGHTS, SCALARS))
        await driver.in_queue.put(m.SetImages(None, *imgs, False))
        await driver.in_queue.put(m.SetOptimizer('adam'))
        await driver.in_queue.put(m.StartIteration())
        carried = {}
        for _ in range(6):
            it = await _drain_until(driver, m.Iterate)
            carried[it.i] = it.image is not None
        assert carried[1] is True            # first iterate: always an image
        assert carried[2] is False and carried[4] is False
        assert carried[3] is True and carried[6] is True

        # Reset mid-run: iterate 1 of the new run carries an image again.
        await driver.in_queue.put(m.SetImages(input_image=imgs[0],
                                              reset_state=True))
        it = await _drain_until(driver, m.Iterate)
        while it.i != 1:
            it = await _drain_until(driver, m.Iterate)
        assert it.image is not None
        await driver.in_queue.put(m.Shutdown())
        await task
    run(body())


def test_driver_adaptive_dispatch():
    """adaptive_max_steps: the dispatch right after any control message is
    a single step (control latency <= 1 iteration); with a quiet queue,
    dispatches fuse K steps."""
    async def body():
        driver = Driver(random_params(0), adaptive_max_steps=4,
                        pipeline_depth=1)
        calls = []
        real_step = driver.transfer.step
        real_begin = driver.transfer.begin_steps

        def spy_step(*a, **kw):
            calls.append(1)
            return real_step(*a, **kw)

        def spy_begin(n, *a, **kw):
            calls.append(n)
            return real_begin(n, *a, **kw)

        driver.transfer.step = spy_step
        driver.transfer.begin_steps = spy_begin

        task = asyncio.ensure_future(driver.run())
        await _drain_until(driver, m.WorkerReady)
        rng = np.random.RandomState(5)
        imgs = [rng.randint(0, 256, (24, 24, 3)).astype(np.uint8)
                for _ in range(3)]
        await driver.in_queue.put(m.SetWeights(WEIGHTS, SCALARS))
        await driver.in_queue.put(m.SetImages(None, *imgs, False))
        await driver.in_queue.put(m.SetOptimizer('adam'))
        await driver.in_queue.put(m.StartIteration())
        while sum(calls) < 9:
            await _drain_until(driver, m.Iterate)
        assert calls[0] == 1, calls   # control just before: single step
        assert 4 in calls, calls      # quiet queue: fused chunks

        # Pause, let the driver go idle, then resume: the first dispatch
        # after the control burst must again be a single step.
        await driver.in_queue.put(m.PauseIteration())
        while driver.transfer.is_running or not driver.in_queue.empty():
            await asyncio.sleep(0.05)
        await asyncio.sleep(0.2)
        n0 = len(calls)
        await driver.in_queue.put(m.StartIteration())
        while len(calls) < n0 + 2:
            await _drain_until(driver, m.Iterate)
        assert calls[n0] == 1, calls[n0:]
        assert calls[n0 + 1] == 4, calls[n0:]

        await driver.in_queue.put(m.Shutdown())
        await task
    run(body())


def test_app_aspect_change_while_paused_recovers(app_client):
    """Regression: pause -> aspect-CHANGING content upload -> reset ->
    start must iterate. The reference wedges here (its init_arrays
    compares only max-size, app.py:249-252, so the stale-aspect input
    never reconciles with the new content grid and the worker loops on
    GetImages); the state feed now reconciles the full grid."""
    client, loop = app_client

    async def body():
        ws = await client.ws_connect('/websocket')
        got = {}
        async def recv_until(wanted, limit=400):
            for _ in range(limit):
                msg = await asyncio.wait_for(ws.receive(), 240)
                data = json.loads(msg.data)
                got[data['type']] = data
                if data['type'] == wanted:
                    return data
            raise AssertionError('never received %s (got %s)'
                                 % (wanted, list(got)))
        await recv_until('thumbnails')
        await ws.send_str(json.dumps({'type': 'start'}))
        info = await recv_until('iterateInfo')
        while info['i'] < 3:
            got.pop('iterateInfo')
            info = await recv_until('iterateInfo')
        await ws.send_str(json.dumps({'type': 'pause'}))
        await recv_until('state')
        # Square content into a 4:3 session: the grids now disagree.
        resp = await client.post('/upload', data={
            'size': '48', 'slot': 'content', 'data': _data_url((40, 40), 9)})
        assert resp.status == 200
        await ws.send_str(json.dumps({'type': 'reset'}))
        await ws.send_str(json.dumps({'type': 'start'}))
        got.pop('iterateInfo', None)
        info = await recv_until('iterateInfo')
        assert info['i'] >= 1 and np.isfinite(info['trace']['loss'])
        await ws.close()
    loop.run_until_complete(asyncio.wait_for(body(), 300))


def test_driver_pipelined_dispatch():
    """pipeline_depth=2: quiet-phase chunks are split in half and two
    dispatches ride in flight together; Iterate numbering stays strictly
    sequential; a control message still forces the next dispatch to a
    single step (applied only after the in-flight work settles)."""
    async def body():
        driver = Driver(random_params(0), adaptive_max_steps=4,
                        pipeline_depth=2)
        begins = []
        real_begin = driver.transfer.begin_steps

        def spy_begin(n, *a, **kw):
            begins.append(n)
            return real_begin(n, *a, **kw)

        driver.transfer.begin_steps = spy_begin

        task = asyncio.ensure_future(driver.run())
        await _drain_until(driver, m.WorkerReady)
        rng = np.random.RandomState(5)
        imgs = [rng.randint(0, 256, (24, 24, 3)).astype(np.uint8)
                for _ in range(3)]
        await driver.in_queue.put(m.SetWeights(WEIGHTS, SCALARS))
        await driver.in_queue.put(m.SetImages(None, *imgs, False))
        await driver.in_queue.put(m.SetOptimizer('adam'))
        await driver.in_queue.put(m.StartIteration())

        seen = []
        while len(seen) < 12:
            it = await _drain_until(driver, m.Iterate)
            seen.append(it.i)
        # Strictly sequential iterate numbering across pipelined chunks.
        assert seen == list(range(seen[0], seen[0] + len(seen))), seen
        # Chunks are halved (4 // 2 = 2) once the queue is quiet.
        assert 2 in begins and 4 not in begins, begins

        # A weight change lands as a single-step dispatch next.
        await driver.in_queue.put(m.SetWeights(WEIGHTS, dict(SCALARS,
                                                             tv=9.0)))
        await driver.in_queue.put(m.Shutdown())
        await task
    run(body())


def test_begin_collect_matches_run_steps():
    """The split begin/collect pair (pipelining API) is trace-identical to
    the blocking run_steps, including when two dispatches are enqueued
    before either is collected."""
    from style_transfer2_tpu.engine import StyleTransfer

    rng = np.random.RandomState(3)
    imgs = [rng.randint(0, 256, (20, 20, 3)).astype(np.uint8)
            for _ in range(3)]

    def fresh():
        st = StyleTransfer(random_params(0))
        st.set_weights(WEIGHTS, SCALARS)
        st.set_optimizer('lbfgs')
        st.set_step_size(1.0)
        st.set_input(imgs[0])
        st.set_content(imgs[1])
        st.set_style(imgs[2])
        assert st.start()
        return st

    a = fresh()
    a.run_steps(3, fetch_image=False)
    img_a, tr_a = a.run_steps(3)

    b = fresh()
    h1 = b.begin_steps(3)
    h2 = b.begin_steps(3)       # chains on h1's futures on device
    _, traces1 = b.collect_steps(h1, fetch_image=False)
    img_b, traces2 = b.collect_steps(h2)

    assert [t['fevals'] for t in (t.data for t in traces1 + traces2)] == \
        list(range(1, 7))
    for key, val in tr_a.items():
        if key == 'time':
            continue
        np.testing.assert_allclose(traces2[-1].data[key], val, rtol=1e-5,
                                   err_msg=key)
    np.testing.assert_allclose(img_b, img_a, rtol=1e-4, atol=1e-3)


def test_driver_dispatch_watchdog():
    """A wedged device call (the backend/tunnel hang failure mode) must
    raise DeviceTimeoutError out of the driver task within dispatch_timeout
    — the app's supervisor then respawns with backoff — instead of the
    session hanging silently."""
    import time as _time

    from style_transfer2_tpu.serve.driver import DeviceTimeoutError

    async def body():
        driver = Driver(random_params(0))
        task = asyncio.ensure_future(driver.run())
        await _drain_until(driver, m.WorkerReady)

        rng = np.random.RandomState(2)
        imgs = [rng.randint(0, 256, (24, 24, 3)).astype(np.uint8)
                for _ in range(3)]
        await driver.in_queue.put(m.SetWeights(WEIGHTS, SCALARS))
        await driver.in_queue.put(m.SetImages(None, *imgs, False))
        await driver.in_queue.put(m.SetOptimizer('adam'))
        await driver.in_queue.put(m.StartIteration())
        await _drain_until(driver, m.Iterate)

        # Arm the watchdog only once warm (first calls legitimately carry
        # compiles), then wedge the device: every step now blocks far past
        # the timeout.
        driver.dispatch_timeout = 0.3
        driver.transfer.step = lambda fetch=True: _time.sleep(30)
        t0 = asyncio.get_event_loop().time()
        await _drain_until(driver, m.Shutdown)  # finally-block farewell
        with pytest.raises(DeviceTimeoutError):
            await task
        assert asyncio.get_event_loop().time() - t0 < 5.0
    run(body())


def test_app_mesh_snaps_session_grids(tmp_path):
    """With a spatial mesh configured, every grid the tier picks (startup
    feed, size change, content upload) divides by the mesh axis, so the
    placement never silently degrades to replication (VERDICT r2 #4)."""
    from style_transfer2_tpu.serve.app import init

    config = _test_config(tmp_path)
    config['mesh'] = '4'
    loop = asyncio.new_event_loop()
    asyncio.set_event_loop(loop)
    app = init(config=config)
    client = TestClient(TestServer(app), loop=loop)
    loop.run_until_complete(client.start_server())

    async def body():
        tier = app['tier']
        assert tier.placement is not None and tier.placement.n_shards == 4

        ws = await client.ws_connect('/websocket')

        async def recv_until(wanted, limit=300):
            for _ in range(limit):
                msg = await asyncio.wait_for(ws.receive(), 240)
                data = json.loads(msg.data)
                if data['type'] == wanted:
                    return data
            raise AssertionError('never received %s' % wanted)

        await recv_until('workerReady')
        # Startup grid is snapped.
        assert tier.sess.input_arr.shape[0] % 4 == 0
        assert tier.sess.input_arr.shape[1] % 4 == 0

        # Content upload with an awkward aspect: the chosen grid snaps.
        resp = await client.post('/upload', data={
            'size': '47', 'slot': 'content', 'data': _data_url((41, 37), 5)})
        assert resp.status == 200
        new_size = await recv_until('newSize')
        assert new_size['height'] % 4 == 0 and new_size['width'] % 4 == 0

        # And it still iterates (the engine really runs on this grid).
        await ws.send_str(json.dumps({'type': 'start'}))
        info = await recv_until('iterateInfo')
        assert np.isfinite(info['trace']['loss'])
        await ws.close()

    try:
        loop.run_until_complete(asyncio.wait_for(body(), 300))
    finally:
        loop.run_until_complete(client.close())
        loop.close()

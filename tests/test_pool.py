"""Pooled multi-session serving tests: two concurrent sessions on one
batched engine, lane assignment via cookies, independent pause/run, per-lane
weight changes, structure-change rejection, lane exhaustion."""

import asyncio
import configparser
import io
import json

import aiohttp
import numpy as np
import pytest
import yaml
from aiohttp import WSMsgType
from aiohttp.test_utils import TestClient, TestServer
from PIL import Image


def _config():
    cp = configparser.ConfigParser()
    cp['DEFAULT'] = {
        'debug': '0',
        'initial_content': 'examples/golden_gate.jpg',
        'initial_style': 'examples/starry_night.jpg',
        'initial_size': '32',
        'initial_weights': 'initial_weights.yaml',
        'http_host': '127.0.0.1',
        'http_port': '8000',
        'weights': 'random',
        'precision': 'float32',
        'pool_lanes': '2',
        'pool_optimizer': 'adam',
        'pool_sizes': '32 48',
        'max_size': '96',
    }
    return cp['DEFAULT']


async def _make_jar(loop):
    return aiohttp.DummyCookieJar()


@pytest.fixture
def pool_client():
    from style_transfer2_tpu.serve.pool import init
    loop = asyncio.new_event_loop()
    asyncio.set_event_loop(loop)
    app = init(config=_config())
    # DummyCookieJar: sessions manage their own cookies explicitly; the
    # shared client jar would silently reuse session A's cookie for B.
    jar = loop.run_until_complete(_make_jar(loop))
    client = TestClient(TestServer(app), loop=loop, cookie_jar=jar)
    loop.run_until_complete(client.start_server())
    yield client, loop, app
    loop.run_until_complete(client.close())
    loop.close()


@pytest.fixture
def pool_client_prewarm():
    from style_transfer2_tpu.serve.pool import init
    loop = asyncio.new_event_loop()
    asyncio.set_event_loop(loop)
    config = _config()
    config['pool_prewarm'] = 'yes'
    app = init(config=config)
    jar = loop.run_until_complete(_make_jar(loop))
    client = TestClient(TestServer(app), loop=loop, cookie_jar=jar)
    loop.run_until_complete(client.start_server())
    yield client, loop, app
    loop.run_until_complete(client.close())
    loop.close()


class WSSession:
    """One browser session: its own cookie + websocket."""

    def __init__(self, client):
        self.client = client
        self.cookie = None
        self.ws = None
        self.got = {}

    async def open(self):
        resp = await self.client.get('/', headers=self._headers())
        assert resp.status == 200
        for cookie in resp.cookies.values():
            if cookie.key == 'pool_session':
                self.cookie = cookie.value
        assert self.cookie
        self.ws = await self.client.ws_connect('/websocket',
                                               headers=self._headers())
        return self

    def _headers(self):
        return ({'Cookie': 'pool_session=%s' % self.cookie}
                if self.cookie else {})

    async def recv_until(self, wanted, limit=400):
        for _ in range(limit):
            msg = await asyncio.wait_for(self.ws.receive(), 240)
            assert msg.type == WSMsgType.TEXT, msg
            data = json.loads(msg.data)
            self.got[data['type']] = data
            if data['type'] == wanted:
                return data
        raise AssertionError('no %s (got %s)' % (wanted, list(self.got)))

    async def send(self, obj):
        await self.ws.send_str(json.dumps(obj))

    async def output(self):
        resp = await self.client.get('/output', headers=self._headers())
        assert resp.status == 200
        return np.asarray(Image.open(io.BytesIO(await resp.read())))


def test_two_sessions_share_one_engine(pool_client):
    client, loop, app = pool_client

    async def body():
        a = await WSSession(client).open()
        b = await WSSession(client).open()
        assert a.cookie != b.cookie
        await a.recv_until('state')
        await b.recv_until('state')
        lanes = {s.lane for s in app['tier'].sessions.values()}
        assert lanes == {0, 1}

        # Start only session A: it iterates, B stays idle.
        await a.send({'type': 'start'})
        info_a = await a.recv_until('iterateInfo')
        assert info_a['i'] >= 1
        lane_b = [s.lane for s in app['tier'].sessions.values()
                  if s.session_id == b.cookie][0]
        assert app['tier'].engines[(app['tier'].default_hw,
                             app['tier'].main_precision())].t[lane_b] == 0

        # Start B too; both advance independently.
        await b.send({'type': 'start'})
        info_b = await b.recv_until('iterateInfo')
        assert info_b['i'] >= 1
        a.got.pop('iterateInfo')
        info_a2 = await a.recv_until('iterateInfo')
        assert info_a2['i'] > info_a['i']

        # Pause A: A freezes while B keeps running.
        await a.send({'type': 'pause'})
        state = await a.recv_until('state')
        assert state['running'] is False
        await asyncio.sleep(0.3)
        lane_a = [s.lane for s in app['tier'].sessions.values()
                  if s.session_id == a.cookie][0]
        t_a = app['tier'].engines[(app['tier'].default_hw,
                             app['tier'].main_precision())].t[lane_a]
        b.got.pop('iterateInfo')
        await b.recv_until('iterateInfo')
        assert app['tier'].engines[(app['tier'].default_hw,
                             app['tier'].main_precision())].t[lane_a] == t_a  # frozen

        # Per-lane weight VALUE change is accepted.
        params = yaml.safe_load(b.got['newParams']['params'])
        params['weights'][0]['style']['conv1_1'] = 2.5
        b.got.pop('newParams')
        await b.send({'type': 'applyParams',
                      'params': yaml.safe_dump(params)})
        reply = await b.recv_until('newParams')
        assert reply['errorString'] == ''

        # Structure change is rejected with a readable error.
        bad = yaml.safe_load(b.got['newParams']['params'])
        bad['weights'][0]['deepdream'] = {'conv3_1': 1.0}
        b.got.pop('newParams')
        await b.send({'type': 'applyParams', 'params': yaml.safe_dump(bad)})
        reply = await b.recv_until('newParams')
        assert 'structure' in reply['errorString']

        # A size outside the configured bucket list is rejected.
        bad2 = yaml.safe_load(b.got['newParams']['params'])
        bad2['size'] = 64
        b.got.pop('newParams')
        await b.send({'type': 'applyParams', 'params': yaml.safe_dump(bad2)})
        reply = await b.recv_until('newParams')
        assert 'resolutions' in reply['errorString']

        # /output serves each session its own image.
        img_a = await a.output()
        img_b = await b.output()
        assert img_a.shape[:2] == app['tier'].default_hw
        assert not np.array_equal(img_a, img_b)

        await a.ws.close()
        await b.ws.close()
    loop.run_until_complete(asyncio.wait_for(body(), 600))


def test_pool_exhaustion_503(pool_client):
    client, loop, app = pool_client

    async def body():
        a = await WSSession(client).open()
        b = await WSSession(client).open()
        # Third fresh session: no free lane -> 503.
        resp = await client.get('/')
        assert resp.status == 503
        await a.ws.close()
        await b.ws.close()
    loop.run_until_complete(asyncio.wait_for(body(), 300))


def test_pool_upload_and_reset(pool_client):
    client, loop, app = pool_client

    async def body():
        a = await WSSession(client).open()
        await a.recv_until('state')
        await a.send({'type': 'start'})
        await a.recv_until('iterateInfo')

        # Upload a new content image; the lane requeues and iterates anew.
        rng = np.random.RandomState(3)
        img = Image.fromarray(rng.randint(0, 256, (40, 40, 3)).astype(np.uint8))
        buf = io.BytesIO()
        img.save(buf, format='png')
        import base64
        data_url = ('data:image/png;base64,'
                    + base64.b64encode(buf.getvalue()).decode())
        resp = await client.post(
            '/upload', data={'size': '32', 'slot': 'content',
                             'data': data_url},
            headers=a._headers())
        assert resp.status == 200
        a.got.pop('thumbnails', None)
        await a.recv_until('thumbnails')
        a.got.pop('iterateInfo', None)
        info = await a.recv_until('iterateInfo')
        assert info['i'] >= 1

        # Reset: iterate count restarts.
        await a.send({'type': 'reset'})
        for _ in range(50):
            a.got.pop('iterateInfo', None)
            info = await a.recv_until('iterateInfo')
            if info['i'] == 1:
                break
        assert info['i'] >= 1
        await a.ws.close()
    loop.run_until_complete(asyncio.wait_for(body(), 600))


def test_pool_size_migration_warm_start(pool_client):
    """A pooled session applies a size change via applyParams and continues
    with WARM-STARTED state in the new bucket (reference mid-run resize,
    optimizers.py:29-40): the iterate counter carries over, the new-bucket
    image is the resampled old iterate (not a fresh random init), and
    iteration proceeds at the new resolution."""
    client, loop, app = pool_client

    async def body():
        a = await WSSession(client).open()
        await a.recv_until('state')
        await a.send({'type': 'start'})
        info = await a.recv_until('iterateInfo')
        while info['i'] < 3:
            a.got.pop('iterateInfo')
            info = await a.recv_until('iterateInfo')
        img32 = await a.output()

        params = yaml.safe_load(a.got['newParams']['params'])
        params['size'] = 48
        a.got.pop('newParams')
        a.got.pop('newSize')
        await a.send({'type': 'applyParams', 'params': yaml.safe_dump(params)})
        reply = await a.recv_until('newParams')
        assert reply['errorString'] == ''
        new_size = a.got['newSize']   # pushed just before newParams
        tier = app['tier']
        sess = list(tier.sessions.values())[0]
        assert max(sess.bucket_hw) == 48
        assert (new_size['height'], new_size['width']) == tuple(sess.bucket_hw)

        # Warm start: the migrated input is the resampled old iterate.
        img48 = np.float32(sess.input_arr)
        up = np.float32(np.asarray(
            Image.fromarray(np.uint8(np.clip(img32, 0, 255)))
            .resize(sess.bucket_hw[::-1], Image.LANCZOS)))
        corr = np.corrcoef(img48.ravel(), up.ravel())[0, 1]
        assert corr > 0.8, 'migrated input not warm-started (corr %.3f)' % corr

        # Iteration continues in the new bucket, counter carried over.
        i_before = sess.i
        a.got.pop('iterateInfo', None)
        info = await a.recv_until('iterateInfo')
        assert info['i'] > i_before >= 3
        assert np.isfinite(info['trace']['loss'])
        out = await a.output()
        assert out.shape[:2] == sess.bucket_hw

        await a.ws.close()
    loop.run_until_complete(asyncio.wait_for(body(), 600))


def test_pool_device_watchdog(pool_client):
    """A wedged device call marks the tier wedged: stepping stops, router
    heartbeats are disabled, and /stats reports it — instead of a zombie
    instance that still answers HTTP but never iterates."""
    import time as _time

    client, loop, app = pool_client

    async def body():
        tier = app['tier']
        a = await WSSession(client).open()
        await a.recv_until('state')
        await a.send({'type': 'start'})
        await a.recv_until('iterateInfo')  # warm: compiles done

        # Arm the watchdog (read per call) and wedge the engine at the
        # drive loop's dispatch entry point.
        tier.config['pool_dispatch_timeout'] = '0.3'
        engine = next(iter(tier.engines.values()))
        engine.begin_steps_all = lambda k: _time.sleep(30)

        for _ in range(100):
            if tier.wedged:
                break
            await asyncio.sleep(0.1)
        assert tier.wedged
        assert not tier.router.enabled_check()

        resp = await client.get('/stats')
        assert 'WEDGED' in await resp.text()
        await a.ws.close()
    loop.run_until_complete(asyncio.wait_for(body(), 120))


def test_pool_style_upload_keeps_progress(pool_client):
    """A style (or content) upload must NOT restart the stylization: the
    iterate and its counter continue (reference semantics — the worker only
    re-extracts features around the live iterate)."""
    import base64

    client, loop, app = pool_client

    async def body():
        a = await WSSession(client).open()
        await a.recv_until('state')
        await a.send({'type': 'start'})
        info = await a.recv_until('iterateInfo')
        # Let it make some progress.
        for _ in range(30):
            a.got.pop('iterateInfo', None)
            info = await a.recv_until('iterateInfo')
            if info['i'] >= 5:
                break
        assert info['i'] >= 5
        before = info['i']

        rng = np.random.RandomState(7)
        img = Image.fromarray(rng.randint(0, 256, (40, 40, 3)).astype(np.uint8))
        buf = io.BytesIO()
        img.save(buf, format='png')
        data_url = ('data:image/png;base64,'
                    + base64.b64encode(buf.getvalue()).decode())
        resp = await client.post(
            '/upload', data={'size': '32', 'slot': 'style', 'data': data_url},
            headers=a._headers())
        assert resp.status == 200
        a.got.pop('thumbnails', None)
        await a.recv_until('thumbnails')
        a.got.pop('iterateInfo', None)
        info = await a.recv_until('iterateInfo')
        assert info['i'] > before, (info['i'], before)
        await a.ws.close()
    loop.run_until_complete(asyncio.wait_for(body(), 600))


def test_pool_input_upload_keeps_norms_and_counter(pool_client):
    """An input-image upload REPLACES the iterate but must not restart the
    session: reference set_input on a same-shape image (worker.py:191-195)
    keeps the optimizer through objective_changed, the first-eval norm
    cache, and the counter — only reset clears them. The round-4 advisor
    caught this path zeroing the lane's device norms (re-anchoring the
    normalized objective at the uploaded image) while sess.norms kept the
    stale pre-upload capture."""
    import base64

    client, loop, app = pool_client
    tier = app['tier']

    async def body():
        a = await WSSession(client).open()
        await a.recv_until('state')
        await a.send({'type': 'start'})
        for _ in range(30):
            a.got.pop('iterateInfo', None)
            info = await a.recv_until('iterateInfo')
            if info['i'] >= 5:
                break
        assert info['i'] >= 5
        before = info['i']

        sess = next(iter(tier.sessions.values()))
        engine = tier.engine_of(sess)
        vals, set_ = engine.lane_norms(sess.lane)
        vals_before = {k: float(v) for k, v in vals.items()}
        assert all(bool(v) for v in set_.values())  # anchored

        rng = np.random.RandomState(11)
        img = Image.fromarray(rng.randint(0, 256, (32, 32, 3))
                              .astype(np.uint8))
        buf = io.BytesIO()
        img.save(buf, format='png')
        data_url = ('data:image/png;base64,'
                    + base64.b64encode(buf.getvalue()).decode())
        resp = await client.post(
            '/upload', data={'size': '32', 'slot': 'input',
                             'data': data_url},
            headers=a._headers())
        assert resp.status == 200

        a.got.pop('iterateInfo', None)
        info = await a.recv_until('iterateInfo')
        assert info['i'] > before, (info['i'], before)  # counter continues

        vals_after, set_after = engine.lane_norms(sess.lane)
        assert all(bool(v) for v in set_after.values())  # still anchored
        for k, v in vals_after.items():
            assert float(v) == vals_before[k], k  # same anchors, bit-exact
        await a.ws.close()
    loop.run_until_complete(asyncio.wait_for(body(), 600))


def test_pool_concurrent_session_churn(pool_client):
    """Stress the lane lifecycle: concurrent clients churning through
    open / start / upload / reset / size-change / disconnect on a 2-lane
    pool. Asserts the invariants the lane_lock work protects: no two live
    sessions ever share a (bucket, lane), every received frame is
    well-formed, and capacity rejections surface as clean 503s."""
    import base64

    client, loop, app = pool_client
    tier = app['tier']

    rng = np.random.RandomState(11)
    buf = io.BytesIO()
    Image.fromarray(rng.randint(0, 256, (40, 40, 3)).astype(np.uint8)).save(
        buf, format='png')
    data_url = ('data:image/png;base64,'
                + base64.b64encode(buf.getvalue()).decode())

    violations = []

    def check_no_shared_lanes():
        keys = [(s.bucket_hw, s.lane) for s in tier.sessions.values()]
        if len(keys) != len(set(keys)):
            violations.append('shared lane: %s' % keys)

    async def one_client(seed):
        r = np.random.RandomState(seed)
        for _ in range(3):
            try:
                a = await WSSession(client).open()
            except AssertionError:
                # 503 (pool full) renders the error page without a cookie —
                # a clean rejection, try again later.
                await asyncio.sleep(0.2)
                continue
            try:
                await a.recv_until('state')
                await a.send({'type': 'start'})
                await a.recv_until('iterateInfo')
                for _ in range(r.randint(1, 4)):
                    op = r.randint(4)
                    check_no_shared_lanes()
                    if op == 0:
                        slot = ('style', 'content')[r.randint(2)]
                        resp = await client.post(
                            '/upload', data={'size': '32', 'slot': slot,
                                             'data': data_url},
                            headers=a._headers())
                        assert resp.status == 200
                    elif op == 1:
                        await a.send({'type': 'reset'})
                    elif op == 2:
                        await a.send({'type': 'pause'})
                        await a.send({'type': 'start'})
                    else:
                        doc = yaml.safe_load(
                            a.got['newParams']['params'])
                        doc['size'] = (32, 48)[r.randint(2)]
                        await a.send({'type': 'applyParams',
                                      'params': yaml.safe_dump(doc)})
                    a.got.pop('iterateInfo', None)
                    info = await a.recv_until('iterateInfo')
                    assert np.isfinite(info['trace']['loss'])
                    check_no_shared_lanes()
            finally:
                await a.ws.close()
                # Free the lane for the other churners.
                sess = tier.sessions.get(a.cookie)
                if sess is not None:
                    await tier.engine_op(tier.release, sess)
            check_no_shared_lanes()

    async def body():
        await asyncio.gather(*(one_client(100 + i) for i in range(4)))
        assert not violations, violations

    loop.run_until_complete(asyncio.wait_for(body(), 900))


def test_pool_restart_worker_keeps_progress(pool_client):
    """restartWorker on a pooled session costs only optimizer momentum,
    like the reference (app.py:336-344 re-feeds the live iterate to the
    fresh worker): the iterate counter and the image survive; round 2
    re-seeded the lane from random noise."""
    client, loop, app = pool_client

    async def body():
        a = await WSSession(client).open()
        await a.recv_until('state')
        await a.send({'type': 'start'})
        info = await a.recv_until('iterateInfo')
        for _ in range(60):
            if info['i'] >= 5:
                break
            a.got.pop('iterateInfo', None)
            info = await a.recv_until('iterateInfo')
        assert info['i'] >= 5
        before_i = info['i']
        tier = app['tier']
        sess = list(tier.sessions.values())[0]
        img_before = np.float32(
            await tier.engine_op(tier.engine_of(sess).lane_image, sess.lane))

        await a.send({'type': 'restartWorker'})
        a.got.pop('state', None)
        await a.recv_until('state')
        a.got.pop('iterateInfo', None)
        info = await a.recv_until('iterateInfo')
        assert info['i'] > before_i, (info['i'], before_i)

        # The on-device iterate continued from where it was (a random
        # re-seed would decorrelate it completely).
        img_after = np.float32(
            await tier.engine_op(tier.engine_of(sess).lane_image, sess.lane))
        corr = np.corrcoef(img_before.ravel(), img_after.ravel())[0, 1]
        assert corr > 0.8, 'iterate lost across restart (corr %.3f)' % corr
        await a.ws.close()
    loop.run_until_complete(asyncio.wait_for(body(), 600))


def test_pool_wedged_fails_fast(pool_client):
    """Once the watchdog marks the tier wedged, new sessions and engine
    operations 503 immediately instead of queueing behind the stuck
    executor call; an existing session's host-state reads still work."""
    client, loop, app = pool_client

    async def body():
        a = await WSSession(client).open()
        await a.recv_until('state')
        tier = app['tier']
        tier.wedged = True

        # Existing session: /output serves the last host-side snapshot.
        resp = await client.get('/output', headers=a._headers())
        assert resp.status == 200

        # New session: rejected up front.
        resp = await client.get('/')
        assert resp.status == 503

        # Engine ops (upload needs device work): rejected up front.
        import base64
        buf = io.BytesIO()
        Image.new('RGB', (40, 40)).save(buf, format='png')
        data_url = ('data:image/png;base64,'
                    + base64.b64encode(buf.getvalue()).decode())
        resp = await client.post(
            '/upload', data={'size': '32', 'slot': 'style', 'data': data_url},
            headers=a._headers())
        assert resp.status == 503

        tier.wedged = False
        await a.ws.close()
    loop.run_until_complete(asyncio.wait_for(body(), 600))


def test_pool_bucket_prewarm(pool_client_prewarm):
    """pool_prewarm compiles the non-default pool_sizes buckets in the
    background on throwaway engines: the task finishes without creating
    real buckets, live iteration keeps flowing throughout, and a session
    can then migrate into the prewarmed size."""
    client, loop, app = pool_client_prewarm

    async def body():
        tier = app['tier']
        assert tier._prewarm_task is not None
        a = await WSSession(client).open()
        await a.recv_until('state')
        await a.send({'type': 'start'})
        await a.recv_until('iterateInfo')

        await asyncio.wait_for(tier._prewarm_task, 600)
        # Throwaway engines only: the 48px bucket does not exist yet.
        assert set(tier.engines) == {(tier.default_hw,
                                      tier.main_precision())}

        # Live session still iterating; migration into the prewarmed
        # bucket works (its programs are now cached).
        a.got.pop('iterateInfo', None)
        await a.recv_until('iterateInfo')
        params = yaml.safe_load(a.got['newParams']['params'])
        params['size'] = 48
        a.got.pop('newParams')
        await a.send({'type': 'applyParams', 'params': yaml.safe_dump(params)})
        reply = await a.recv_until('newParams')
        assert reply['errorString'] == ''
        sess = list(tier.sessions.values())[0]
        assert max(sess.bucket_hw) == 48
        await a.ws.close()
    loop.run_until_complete(asyncio.wait_for(body(), 600))


def test_pool_stats_reports_lanes_and_capacity_separately(pool_client):
    """/stats reports lanes-in-use vs capacity as distinct numbers (the
    reference's sessions/instances split, router.py:57-63); round 2 summed
    capacity under the name 'instances'."""
    client, loop, app = pool_client

    async def body():
        a = await WSSession(client).open()
        await a.recv_until('state')
        resp = await client.get('/stats')
        assert resp.status == 200
        text = await resp.text()
        assert '1 active sessions' in text
        assert '1/2 engine lanes in use' in text
        await a.ws.close()
    loop.run_until_complete(asyncio.wait_for(body(), 600))


def test_pool_bucket_device_subsets():
    """pool_bucket_devices pins each bucket to its own device subset on the
    virtual mesh: the 'pool small, dedicate large' guidance as config.
    Both sessions progress; each bucket's lane states live only on its
    configured devices; the drive loop's begin-all-then-collect tick keeps
    both buckets stepping in one round."""
    import jax

    from style_transfer2_tpu.serve.pool import init

    loop = asyncio.new_event_loop()
    asyncio.set_event_loop(loop)
    config = _config()
    config['pool_bucket_devices'] = '32:0-1; 48:2,3'
    app = init(config=config)
    jar = loop.run_until_complete(_make_jar(loop))
    client = TestClient(TestServer(app), loop=loop, cookie_jar=jar)
    loop.run_until_complete(client.start_server())
    try:
        async def run():
            tier = app['tier']
            a = await WSSession(client).open()     # default 32px bucket
            b = await WSSession(client).open()
            # Move session B to the 48px bucket.
            await b.recv_until('newParams')
            params = yaml.safe_load(b.got['newParams']['params'])
            params['size'] = 48
            await b.send({'type': 'applyParams',
                          'params': yaml.safe_dump(params)})
            await b.recv_until('newSize')

            await a.send({'type': 'start'})
            await b.send({'type': 'start'})
            ia = await a.recv_until('iterateInfo')
            ib = await b.recv_until('iterateInfo')
            assert np.isfinite(ia['trace']['loss'])
            assert np.isfinite(ib['trace']['loss'])

            devices = jax.devices()
            main = tier.main_precision()
            expect = {(tier.hw_for(32), main): {devices[0], devices[1]},
                      (tier.hw_for(48), main): {devices[2], devices[3]}}
            assert set(tier.engines) == set(expect)
            for key, want in expect.items():
                x = tier.engines[key].states['x']
                used = set(x.sharding.mesh.devices.flat)
                assert used == want, (key, used, want)
            await a.ws.close()
            await b.ws.close()

        loop.run_until_complete(asyncio.wait_for(run(), 600))
    finally:
        loop.run_until_complete(client.close())
        loop.close()


def test_pooled_ladder_climbs_buckets():
    """The pooled multi-scale ladder: a fresh session with `ladder` in its
    params starts in the smallest allowed bucket and migrates up every N
    iterations with warm-started state, ending in its requested bucket."""
    from style_transfer2_tpu.serve.pool import init

    loop = asyncio.new_event_loop()
    asyncio.set_event_loop(loop)
    config = _config()
    config['initial_size'] = '48'
    config['pool_sizes'] = '24 32 48'
    config['serve_ladder'] = '3'
    app = init(config=config)
    jar = loop.run_until_complete(_make_jar(loop))
    client = TestClient(TestServer(app), loop=loop, cookie_jar=jar)
    loop.run_until_complete(client.start_server())
    try:
        async def run():
            tier = app['tier']
            a = await WSSession(client).open()
            await a.recv_until('state')
            sess = next(iter(tier.sessions.values()))
            target_hw = sess.bucket_hw
            assert max(target_hw) == 48

            await a.send({'type': 'start'})
            # Drops to the smallest allowed bucket first.
            msg = await a.recv_until('newSize')
            assert max(msg['height'], msg['width']) == 24
            assert sess.ladder is not None

            # Climbs through 32 to 48, then the schedule clears.
            seen = [24]
            for _ in range(400):
                if sess.ladder is None and sess.bucket_hw == target_hw:
                    break
                try:
                    msg = await asyncio.wait_for(a.ws.receive(), 5)
                except asyncio.TimeoutError:
                    continue
                data = json.loads(msg.data)
                if data['type'] == 'newSize':
                    seen.append(max(data['height'], data['width']))
            assert sess.ladder is None
            assert sess.bucket_hw == target_hw
            assert seen == [24, 32, 48], seen
            # Iterates carried across migrations (warm-started counter).
            assert sess.i >= 6
            await a.ws.close()

        loop.run_until_complete(asyncio.wait_for(run(), 600))
    finally:
        loop.run_until_complete(client.close())
        loop.close()


def test_pooled_polish_tail_and_exit():
    """Pooled polish: when the ladder completes, a `polish` session
    migrates to a bucket at the SAME grid but the raised polish precision
    (iterate carried, optimizer re-primed), runs N iterations, and pauses;
    a reset's restarted ladder migrates it back to the main precision."""
    from style_transfer2_tpu.serve.pool import init

    loop = asyncio.new_event_loop()
    asyncio.set_event_loop(loop)
    config = _config()
    config['initial_size'] = '32'
    config['pool_sizes'] = '24 32'
    config['serve_ladder'] = '2'
    config['precision'] = 'bfloat16'
    config['serve_polish'] = '2'
    config['polish_precision'] = 'float32'
    app = init(config=config)
    jar = loop.run_until_complete(_make_jar(loop))
    client = TestClient(TestServer(app), loop=loop, cookie_jar=jar)
    loop.run_until_complete(client.start_server())
    try:
        async def run():
            tier = app['tier']
            a = await WSSession(client).open()
            await a.recv_until('state')
            sess = next(iter(tier.sessions.values()))
            target_hw = sess.bucket_hw
            assert sess.precision == 'bfloat16'

            await a.send({'type': 'start'})
            # Ladder 24 -> 32, then the polish tail runs and pauses.
            for _ in range(1500):
                if (sess.ladder is None and sess.polish is None
                        and sess.precision == 'float32'
                        and not sess.running):
                    break
                await asyncio.sleep(0.2)
            assert sess.ladder is None and sess.polish is None
            assert sess.precision == 'float32'
            assert not sess.running            # tail done -> paused
            assert sess.bucket_hw == target_hw  # same grid, raised precision
            assert tier.engine_of(sess).precision == 'float32'
            i_polished = sess.i

            # Reset: the restarted ladder's rung-0 migration exits the
            # polish bucket back to the main precision.
            await a.send({'type': 'reset'})
            for _ in range(300):
                if sess.precision == 'bfloat16':
                    break
                await asyncio.sleep(0.2)
            assert sess.precision == 'bfloat16'
            assert sess.ladder is not None     # schedule restarted
            assert i_polished >= 2             # the tail actually iterated
            await a.ws.close()

        loop.run_until_complete(asyncio.wait_for(run(), 560))
    finally:
        loop.run_until_complete(client.close())
        loop.close()

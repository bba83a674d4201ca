#!/usr/bin/env python3
"""Pooled multi-session serving: many users on ONE device program.

The reference scales to N users with N (app + worker) process pairs behind
the router — one whole chip-equivalent per user. This tier is the TPU-native
collapse of that design (SURVEY.md §2 "sessions -> batch lanes"): a single
aiohttp app hosts many cookie-identified sessions, each mapped to a lane of
a BatchedStyleTransfer bucket; one vmapped step advances every running
session per dispatch, so concurrent users share the chip instead of queueing
for it.

Scope (bucketed batching): all sessions share the bucket's resolution,
objective structure, and optimizer; per-session images, weight VALUES,
tv/p scalars, step size, and pause state are independent. Structure-changing
edits are rejected with a readable error (run the classic per-session app
for fully heterogeneous sessions).

HTTP/WS protocol: identical to serve/app.py (and the reference), with a
session cookie selecting the lane.
"""

import asyncio
import binascii
import io
import json
import logging
import os
import time
from pathlib import Path

import aiohttp
from aiohttp import web
import numpy as np
from PIL import Image
import yaml

from .. import utils
from ..engine.batched import BatchedStyleTransfer
from ..engine.objective import ObjectiveSpec
from ..models.weights import resolve_params
from .error_pages import error_pages
from .render import add_static_routes, render

ROOT_DIR = Path(__file__).resolve().parents[2]

logger = logging.getLogger('pool')

SESSION_COOKIE = 'pool_session'


class Session:
    """Host-side state of one user session (one lane)."""

    def __init__(self, session_id, lane, app):
        self.session_id = session_id
        self.lane = lane
        self.wss = []
        self.running = False
        self.input_arr = None
        self.input_was_reset = False
        self.i = 0
        self.last_it_time = 0.0
        self.its_per_s = utils.DecayingMean()
        self.params = {}
        self.content_image = None
        self.style_image = None
        self.content_thumbnail = None
        self.style_thumbnail = None
        self.last_access = time.monotonic()

    def send(self, msg):
        data = json.dumps(msg)
        for ws in list(self.wss):
            async def _send(ws=ws):
                try:
                    await ws.send_str(data)
                except (RuntimeError, ConnectionError,
                        asyncio.CancelledError):
                    pass
            asyncio.ensure_future(_send())


def _thumb(pil_image, size=300):
    small = utils.resize_to_fit(pil_image, size, scale_up=False)
    buf = io.BytesIO()
    small.save(buf, format='jpeg', quality=85)
    return ('data:image/jpeg;base64,'
            + binascii.b2a_base64(buf.getvalue()).decode())


def _get_session(request, create=True):
    app = request.app
    sid = request.cookies.get(SESSION_COOKIE)
    if sid and sid in app['sessions']:
        sess = app['sessions'][sid]
        sess.last_access = time.monotonic()
        return sess, False
    if not create:
        raise web.HTTPForbidden()
    engine = app['engine']
    lane = engine.free_lane()
    if lane is None:
        raise web.HTTPServiceUnavailable()
    sid = os.urandom(8).hex()
    sess = Session(sid, lane, app)
    _init_session(app, sess)
    app['sessions'][sid] = sess
    logger.info('new session %s on lane %d', sid, lane)
    return sess, True


def _init_session(app, sess):
    """Seeds a session with the configured demo job (reference
    app.py:231-262)."""
    config = app['config']
    engine = app['engine']
    hw = app['bucket_hw']
    content = Image.open(str(ROOT_DIR / config['initial_content'])).convert('RGB')
    style = Image.open(str(ROOT_DIR / config['initial_style'])).convert('RGB')
    sess.content_image = content
    sess.style_image = style
    sess.content_thumbnail = _thumb(content)
    sess.style_thumbnail = _thumb(style)
    sess.params = {
        'optimizer': engine.optimizer_name,
        'optimizer_step_size': float(np.asarray(engine.step_sizes[sess.lane])),
        'size': max(hw),
        'weights': [dict(engine.default_weights),
                    dict(engine.default_scalars)],
    }
    content_arr = np.uint8(content.resize(hw[::-1], Image.LANCZOS))
    style_arr = np.uint8(utils.resize_to_fit(style, max(hw)))
    style_arr = np.uint8(Image.fromarray(style_arr).resize(hw[::-1],
                                                           Image.LANCZOS))
    rng = np.random.RandomState()
    sess.input_arr = np.uint8(rng.uniform(0, 255, hw + (3,)))
    engine.add_job(content_arr, style_arr, sess.input_arr, lane=sess.lane)
    engine.set_running(sess.lane, False)


def _release_session(app, sess):
    app['engine'].remove_job(sess.lane)
    app['sessions'].pop(sess.session_id, None)
    logger.info('released session %s (lane %d)', sess.session_id, sess.lane)


# -- HTTP handlers -------------------------------------------------------------

async def root(request):
    sess, created = _get_session(request)
    resp = render('index.html', {
        'max_size': max(request.app['bucket_hw']),
        'ga_tracking_code': request.app['config'].get('ga_tracking_code', ''),
        'top': '',
    })
    if created:
        resp.set_cookie(SESSION_COOKIE, sess.session_id)
    return resp


async def output_image(request):
    sess, _ = _get_session(request, create=False)
    buf = io.BytesIO()
    utils.as_pil(sess.input_arr).save(buf, format='png')
    return web.Response(content_type='image/png', body=buf.getvalue(),
                        headers={'Cache-Control': 'no-cache'})


async def upload(request):
    app = request.app
    sess, _ = _get_session(request, create=False)
    engine = app['engine']
    hw = app['bucket_hw']
    msg = await request.post()
    data = binascii.a2b_base64(msg['data'].partition(',')[2])
    image = Image.open(io.BytesIO(data)).convert('RGB')
    arr = np.uint8(image.resize(hw[::-1], Image.LANCZOS))

    slot = msg['slot']
    if slot == 'content':
        sess.content_image = image
        sess.content_thumbnail = _thumb(image)
        sess.its_per_s.clear()
        _requeue(app, sess, content=arr)
        sess.send(dict(type='thumbnails', content=sess.content_thumbnail))
    elif slot == 'style':
        sess.style_image = image
        sess.style_thumbnail = _thumb(image)
        _requeue(app, sess, style=arr)
        sess.send(dict(type='thumbnails', style=sess.style_thumbnail))
    elif slot == 'input':
        sess.input_arr = arr
        _requeue(app, sess, input_arr=arr, keep_input=True)
    else:
        raise web.HTTPBadRequest(reason='unknown slot')
    return web.Response()


def _requeue(app, sess, content=None, style=None, input_arr=None,
             keep_input=False, reset_input=False):
    """Re-adds the session's job to its lane with updated slots (the batched
    engine re-initializes the lane's optimizer state; images default to the
    current session state)."""
    engine = app['engine']
    hw = app['bucket_hw']
    was_running = engine.running[sess.lane]
    content = content if content is not None else np.uint8(
        sess.content_image.resize(hw[::-1], Image.LANCZOS))
    style = style if style is not None else np.uint8(
        sess.style_image.resize(hw[::-1], Image.LANCZOS))
    if input_arr is None:
        if keep_input and sess.input_arr is not None and not reset_input:
            input_arr = sess.input_arr
        else:
            input_arr = np.uint8(np.random.uniform(0, 255, hw + (3,)))
            sess.input_arr = input_arr
            sess.input_was_reset = True
    weights, scalars = sess.params['weights']
    engine.remove_job(sess.lane)
    engine.add_job(content, style, input_arr, weights=weights,
                   scalar_params=scalars,
                   step_size=sess.params.get('optimizer_step_size'),
                   lane=sess.lane)
    sess.i = 0
    engine.set_running(sess.lane, was_running)


async def websocket(request):
    app = request.app
    sess, _ = _get_session(request, create=False)
    ws = web.WebSocketResponse()
    await ws.prepare(request)
    sess.wss.append(ws)

    sess.send(dict(type='workerReady'))
    sess.send(dict(type='newParams', params=yaml.safe_dump(sess.params)))
    h, w = app['bucket_hw']
    sess.send(dict(type='newSize', height=h, width=w))
    sess.send(dict(type='state', running=sess.running))
    sess.send(dict(type='thumbnails', content=sess.content_thumbnail,
                   style=sess.style_thumbnail))

    engine = app['engine']
    try:
        async for msg in ws:
            if msg.type != aiohttp.WSMsgType.TEXT:
                break
            sess.last_access = time.monotonic()
            msg = json.loads(msg.data)
            msg_type = msg.get('type')
            if msg_type == 'applyParams':
                process_params(app, sess, msg)
            elif msg_type == 'pause':
                engine.set_running(sess.lane, False)
                sess.running = False
                sess.send(dict(type='state', running=False))
            elif msg_type == 'reset':
                _requeue(app, sess, reset_input=True)
            elif msg_type == 'restartWorker':
                # Pool mode has no per-session worker; a reset of the lane is
                # the closest equivalent.
                _requeue(app, sess, reset_input=True)
                sess.send(dict(type='state', running=sess.running))
            elif msg_type == 'start':
                engine.set_running(sess.lane, True)
                sess.running = True
                sess.send(dict(type='state', running=True))
                app['wake'].set()
            else:
                logger.error('unknown WS message type %r', msg_type)
    finally:
        sess.wss.remove(ws)
    return ws


def process_params(app, sess, msg):
    """applyParams for a pooled session: weight VALUES, scalars, and step
    size apply per lane; size/optimizer/structure changes are bucket-fixed
    and rejected with a readable error."""
    engine = app['engine']
    error_string = ''
    try:
        params = yaml.safe_load(msg['params'])
        if int(params['size']) != max(app['bucket_hw']):
            raise ValueError(
                'This pooled instance serves a fixed resolution of %d px; '
                'use the dedicated app for resolution changes.'
                % max(app['bucket_hw']))
        if params['optimizer'] != engine.optimizer_name:
            raise ValueError(
                "This pooled instance runs the '%s' optimizer for all "
                'sessions.' % engine.optimizer_name)

        weights = {}
        for loss_name in ('content', 'style', 'deepdream'):
            weights[loss_name] = {}
            for layer, weight in params['weights'][0][loss_name].items():
                if layer not in app['layers']:
                    raise ValueError(
                        'Invalid layer name. Valid layer names are: %s.'
                        % ', '.join(app['layers']))
                weights[loss_name][layer] = float(weight)
        scalars = {k: float(params['weights'][1][k])
                   for k in ('tv', 'tv_power', 'p', 'p_power')}

        spec_check = ObjectiveSpec.from_weights(weights, scalars)
        if spec_check != engine.spec:
            raise ValueError(
                'This pooled instance serves a fixed objective structure '
                '(which layers carry which losses); weight values may '
                'change, structure may not.')

        engine.set_lane_weights(sess.lane, weights, scalars)
        engine.set_step_size(sess.lane, float(params['optimizer_step_size']))
        sess.params = params
    except KeyError as err:
        error_string = (type(err).__name__ + ': ' + str(err) +
                        ": All required parameters were not found. Please "
                        "don't delete parameters.")
    except Exception as err:
        error_string = type(err).__name__ + ': ' + str(err)
    finally:
        sess.send(dict(type='newParams', params=yaml.safe_dump(sess.params),
                       errorString=error_string))


# -- The stepping task ----------------------------------------------------------

async def pool_driver(app):
    """Steps every running lane with one batched dispatch per tick (K fused
    steps when pool_steps_per_dispatch > 1), then fans Iterate bookkeeping
    out to the sessions. The image is snapshotted once per tick; each fused
    step still gets its own iterateInfo trace."""
    engine = app['engine']
    k = app['config'].getint('pool_steps_per_dispatch', 1)
    loop = asyncio.get_event_loop()
    while True:
        if not engine.any_running():
            app['wake'].clear()
            await app['wake'].wait()
            continue
        lane_traces = await loop.run_in_executor(
            app['executor'], engine.run_steps_all, k)
        now = time.perf_counter()
        by_lane = {s.lane: s for s in app['sessions'].values()}
        for lane, traces in lane_traces.items():
            sess = by_lane.get(lane)
            if sess is None:
                continue
            image = await loop.run_in_executor(
                app['executor'], engine.lane_image, lane)
            i = engine.t[lane]
            if i == len(traces):
                sess.its_per_s.clear()
            else:
                per_step = max(now - sess.last_it_time, 1e-9) / len(traces)
                sess.its_per_s(1 / per_step)
            sess.i = i
            sess.last_it_time = now
            step_size = 0.0
            if i > 1 and image.shape == sess.input_arr.shape:
                diff = image - np.float32(sess.input_arr)
                step_size = float(np.sqrt(np.mean(diff ** 2)))
            if not sess.input_was_reset or i == len(traces):
                sess.input_was_reset = False
                sess.input_arr = image
                for j, trace in enumerate(traces):
                    sess.send(dict(type='iterateInfo',
                                   i=i - len(traces) + 1 + j,
                                   trace=dict(trace), stepSize=step_size,
                                   itsPerS=sess.its_per_s()))
        await asyncio.sleep(0)


async def expire_sessions(app):
    timeout = app['config'].getint('pool_session_timeout', 300)
    while True:
        now = time.monotonic()
        for sess in list(app['sessions'].values()):
            if not sess.wss and sess.last_access < now - timeout:
                _release_session(app, sess)
        await asyncio.sleep(5)


# -- Lifecycle -------------------------------------------------------------------

def _router_url(app):
    config = app['config']
    host = config.get('router_host', '')
    port = config.get('router_control_port', '')
    if host and port:
        return 'http://%s:%s' % (host, port)
    return None


async def ping_router(app):
    """Registers this pooled instance with the router, advertising its lane
    capacity (the router then routes up to pool_lanes sessions here and
    leaves per-session state management to the pool)."""
    url = _router_url(app)
    config = app['config']
    payload = {
        'addr': 'http://%s:%s/__control/reset'
                % (config.get('pool_host', config['http_host']),
                   config.get('pool_port', config['http_port'])),
        'host': config.get('pool_host', config['http_host']),
        'port': int(config.get('pool_port', config['http_port'])),
        'app_id': app['id'],
        'capacity': app['engine'].max_lanes,
    }
    while True:
        try:
            async with aiohttp.ClientSession() as sess:
                await sess.post(url + '/__register', json=payload,
                                timeout=aiohttp.ClientTimeout(total=2))
        except Exception as err:
            logger.debug('router ping failed: %s', err)
        await asyncio.sleep(5)


async def startup_tasks(app):
    import concurrent.futures

    config = app['config']
    size = config.getint('initial_size', 300)
    content = Image.open(str(ROOT_DIR / config['initial_content'])).convert('RGB')
    wh = utils.fit_into_square(content.size, size, scale_up=True)
    app['bucket_hw'] = (wh[1], wh[0])

    with open(str(ROOT_DIR / config['initial_weights'])) as f:
        weights_doc = yaml.safe_load(f)

    params = resolve_params(config.get('weights', 'auto'), ROOT_DIR)
    placement = None
    mesh_spec = config.get('pool_mesh', '')
    if mesh_spec:
        from ..parallel import DataPlacement, make_mesh
        placement = DataPlacement(make_mesh(mesh_spec, axis_names=('data',)))

    app['engine'] = BatchedStyleTransfer(
        params, weights_doc[0], weights_doc[1], app['bucket_hw'],
        max_lanes=config.getint('pool_lanes', 4),
        optimizer=config.get('pool_optimizer', 'adam'),
        precision=config.get('precision', 'float32'),
        placement=placement)
    app['layers'] = app['engine'].model.layers()
    app['sessions'] = {}
    app['wake'] = asyncio.Event()
    app['executor'] = concurrent.futures.ThreadPoolExecutor(
        max_workers=1, thread_name_prefix='pool-driver')
    app['id'] = os.urandom(8).hex()
    app['driver_task'] = asyncio.ensure_future(pool_driver(app))
    app['expire_task'] = asyncio.ensure_future(expire_sessions(app))
    app['pr_task'] = None
    if _router_url(app):
        app['pr_task'] = asyncio.ensure_future(ping_router(app))


async def cleanup_tasks(app):
    if app.get('pr_task'):
        app['pr_task'].cancel()
        try:
            async with aiohttp.ClientSession() as sess:
                await sess.post(_router_url(app) + '/__unregister',
                                json={'app_id': app['id']},
                                timeout=aiohttp.ClientTimeout(total=2))
        except Exception:
            pass
    app['driver_task'].cancel()
    app['expire_task'].cancel()
    app['executor'].shutdown(wait=False)


async def stats(request):
    app = request.app
    engine = app['engine']
    return render('stats.html', {
        'instances': engine.max_lanes,
        'sessions': len(app['sessions']),
        'timestamp': time.asctime(time.gmtime()),
        'loadavg': os.getloadavg(),
        'devices': ', '.join(str(d) for d in __import__('jax').devices()),
        'ga_tracking_code': app['config'].get('ga_tracking_code', '')})


def init(args=None, config=None):
    if config is None:
        config = utils.read_config(args)
    template_vars = {'ga_tracking_code': config.get('ga_tracking_code', '')}
    app = web.Application(middlewares=[error_pages(template_vars)],
                          client_max_size=64 * 1024 ** 2)
    app['config'] = config
    app['debug_level'] = config.getint('debug', 0)
    if args is not None and args.debug:
        app['debug_level'] += args.debug

    app.router.add_route('GET', '/', root)
    app.router.add_route('GET', '/output', output_image)
    app.router.add_route('POST', '/upload', upload)
    app.router.add_route('GET', '/websocket', websocket)
    app.router.add_route('GET', '/stats', stats)
    add_static_routes(app)

    app.on_startup.append(startup_tasks)
    app.on_cleanup.append(cleanup_tasks)
    return app


def main():
    """The main function."""
    utils.setup_exceptions()
    utils.setup_signals()
    args = utils.parse_args(__doc__)
    app = init(args)
    utils.setup_logging(app['debug_level'])

    platform = app['config'].get('platform', '')
    if platform:
        import jax
        jax.config.update('jax_platforms', platform)

    try:
        web.run_app(app, host=app['config'].get('pool_host',
                                                app['config']['http_host']),
                    port=int(app['config'].get('pool_port',
                                               app['config']['http_port'])),
                    shutdown_timeout=1)
    except KeyboardInterrupt:
        pass
    finally:
        logger.info('Shutting down pool app.')


if __name__ == '__main__':
    main()

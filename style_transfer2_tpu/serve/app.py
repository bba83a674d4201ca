#!/usr/bin/env python3
"""The web application: interactive neural style transfer over HTTP/WS.

Replicates the reference app server's external API exactly (app.py: routes
GET /, GET /output, POST /upload, GET /websocket + static; WS JSON types
applyParams/pause/reset/restartWorker/start inbound and iterateInfo/
newParams/newSize/state/thumbnails/workerReady outbound) while replacing the
worker subprocess + ZeroMQ with the in-process TPU driver task
(serve/driver.py) and asyncio queues.

Session state lives here ("state above, compute below"): the current input
array, PIL content/style images, the params document, iterate bookkeeping.
A crashed driver is respawned by the supervisor and re-fed the state via
init_arrays / the GetImages handshake — same recovery story as the
reference's monitor_worker (app.py:336-344), minus the OS process.
"""

import asyncio
import binascii
import io
import json
import logging
import os
from pathlib import Path

import aiohttp
from aiohttp import web
import numpy as np
from PIL import Image
import yaml

from .. import utils
from ..models.weights import resolve_params
from . import messages as m
from .driver import Driver
from .error_pages import error_pages
from .render import add_static_routes, render

ROOT_DIR = Path(__file__).resolve().parents[2]

logger = logging.getLogger('app')


# -- HTTP handlers (reference app.py:47-110) ---------------------------------

async def root(request):
    app = request.app
    top = ''
    top_path = app['config'].get('top', '')
    if top_path and Path(top_path).exists():
        top = open(top_path).read()
    return render('index.html', {
        'max_size': app['config'].getint('max_size', 9999),
        'ga_tracking_code': app['config'].get('ga_tracking_code', ''),
        'top': top,
    })


async def output_image(request):
    buf = io.BytesIO()
    utils.as_pil(request.app['input_arr']).save(buf, format='png')
    headers = {'Cache-Control': 'no-cache'}
    return web.Response(content_type='image/png', body=buf.getvalue(),
                        headers=headers)


async def upload(request):
    app = request.app
    msg = await request.post()
    data = binascii.a2b_base64(msg['data'].partition(',')[2])
    image = Image.open(io.BytesIO(data)).convert('RGB')
    thumbnail_msg = None
    if msg['slot'] == 'input':
        current_image = np.uint8(image.resize(
            app['input_arr'].shape[:2][::-1], Image.LANCZOS))
        app['input_arr'] = current_image
        out_msg = m.SetImages(input_image=current_image)
    elif msg['slot'] == 'style':
        current_image = np.uint8(utils.resize_to_fit(image, int(msg['size'])))
        app['style_size'] = msg['size']
        out_msg = m.SetImages(style_image=current_image)
        app['style_image'] = image
        make_thumbnails(app)
        thumbnail_msg = dict(type='thumbnails', style=app['style_thumbnail'])
    elif msg['slot'] == 'content':
        current_image = np.uint8(utils.resize_to_fit(
            image, _snap_size(app, msg['size'])))
        input_image = m.SetImages.RESAMPLE
        if app['i'] <= 1:
            input_image = np.uint8(np.random.uniform(
                0, 255, current_image.shape[:2] + (3,)))
            app['input_arr'] = input_image
        out_msg = m.SetImages(current_image.shape[:2], input_image,
                              current_image)
        app['its_per_s'].clear()
        app['content_image'] = image
        app['content_thumbnail'] = None
        make_thumbnails(app)
        send_websocket(app, dict(type='newSize', height=current_image.shape[0],
                                 width=current_image.shape[1]))
        app['params']['size'] = int(max(current_image.shape[:2]))
        send_websocket(app, dict(type='newParams', params=get_params(app)))
        thumbnail_msg = dict(type='thumbnails',
                             content=app['content_thumbnail'])
    else:
        raise web.HTTPBadRequest(reason='unknown slot')
    await app['driver'].in_queue.put(out_msg)
    if thumbnail_msg is not None:
        send_websocket(app, thumbnail_msg)
    return web.Response()


def make_thumbnails(app, size=300):
    header = 'data:image/jpeg;base64,'
    if not app.get('content_thumbnail'):
        small = utils.resize_to_fit(app['content_image'], size, scale_up=False)
        buf = io.BytesIO()
        small.save(buf, format='jpeg', quality=85)
        app['content_thumbnail'] = header + binascii.b2a_base64(
            buf.getvalue()).decode()
    if not app.get('style_thumbnail'):
        small = utils.resize_to_fit(app['style_image'], size, scale_up=False)
        buf = io.BytesIO()
        small.save(buf, format='jpeg', quality=85)
        app['style_thumbnail'] = header + binascii.b2a_base64(
            buf.getvalue()).decode()


# -- WebSocket control channel (reference app.py:113-174) ---------------------

async def websocket(request):
    app = request.app
    ws = web.WebSocketResponse()
    await ws.prepare(request)
    app['wss'].append(ws)

    if app['worker_ready']:
        send_websocket(app, dict(type='workerReady'))
    send_websocket(app, dict(type='newParams', params=get_params(app)))
    h, w = app['input_arr'].shape[:2]
    send_websocket(app, dict(type='newSize', height=h, width=w))
    send_websocket(app, dict(type='state', running=app['running']))
    make_thumbnails(app)
    send_websocket(app, dict(type='thumbnails',
                             content=app['content_thumbnail'],
                             style=app['style_thumbnail']))

    try:
        async for msg in ws:
            if msg.type != aiohttp.WSMsgType.TEXT:
                break
            msg = json.loads(msg.data)
            msg_type = msg.get('type')
            if msg_type == 'applyParams':
                await process_params(app, msg)
            elif msg_type == 'pause':
                await app['driver'].in_queue.put(m.PauseIteration())
                app['running'] = False
                send_websocket(app, dict(type='state', running=False))
            elif msg_type == 'reset':
                image = np.uint8(np.random.uniform(
                    0, 255, app['input_arr'].shape))
                app['input_arr'] = image
                app['input_was_reset'] = True
                await app['driver'].in_queue.put(
                    m.SetImages(input_image=image, reset_state=True))
            elif msg_type == 'restartWorker':
                app['running'] = False
                send_websocket(app, dict(type='state', running=False))
                await app['driver'].in_queue.put(m.Shutdown())
            elif msg_type == 'start':
                await app['driver'].in_queue.put(m.StartIteration())
                app['running'] = True
                send_websocket(app, dict(type='state', running=True))
            else:
                logger.error('Received a WebSocket message of unknown type.')
    finally:
        app['wss'].remove(ws)
    return ws


def _send_safely(ws, data):
    """Fire-and-forget send that swallows disconnect races."""
    async def _send():
        try:
            await ws.send_str(data)
        except (RuntimeError, ConnectionError, asyncio.CancelledError):
            pass
    asyncio.ensure_future(_send())


def send_websocket(app, msg):
    """Broadcasts a JSON message to all connected WebSocket clients."""
    data = json.dumps(msg)
    for ws in list(app['wss']):
        _send_safely(ws, data)


# -- Params document (reference app.py:173-262) -------------------------------

def get_params(app):
    return yaml.safe_dump(app['params'])


def _snap_size(app, size):
    """Optionally snaps a requested size to a multiple of `size_snap`:
    every distinct (H, W) compiles a fresh XLA program (minutes over a
    remote-compile tunnel), so production configs quantize user resizes to
    keep the compile cache hot. Off by default — reference behavior."""
    snap = app['config'].getint('size_snap', 0)
    if snap <= 0:
        return int(size)
    return max(snap, int(round(int(size) / snap)) * snap)


async def process_params(app, msg):
    error_string = ''
    try:
        params = yaml.safe_load(msg['params'])

        max_size = app['config'].getint('max_size', 9999)
        if params['size'] > max_size:
            raise ValueError('Size is over %d' % max_size)
        params['size'] = _snap_size(app, params['size'])

        if params['size'] != max(app['input_arr'].shape):
            new_size = utils.fit_into_square(app['input_arr'].shape[:2],
                                             params['size'], True)
            content_image = app['content_image'].resize(new_size[::-1],
                                                        Image.LANCZOS)
            app['its_per_s'].clear()

            if app['i'] <= 1:
                input_image = np.uint8(np.random.uniform(
                    0, 255, new_size + (3,)))
            else:
                input_image = utils.resample_hwc(app['input_arr'], new_size)
            app['input_arr'] = input_image

            msg_out = m.SetImages(new_size, input_image,
                                  np.uint8(content_image))
            await app['driver'].in_queue.put(msg_out)
            send_websocket(app, dict(type='newSize', height=new_size[0],
                                     width=new_size[1]))

        await app['driver'].in_queue.put(
            m.SetOptimizer(params['optimizer'], params['optimizer_step_size']))

        weights = {}
        for loss_name in m.SetWeights.loss_names:
            weights[loss_name] = {}
            for layer, weight in params['weights'][0][loss_name].items():
                if layer not in app['layers']:
                    raise ValueError(
                        'Invalid layer name. Valid layer names are: %s.'
                        % ', '.join(app['layers']))
                weights[loss_name][layer] = float(weight)

        scalar_weights = {}
        for loss_name in m.SetWeights.scalar_loss_names:
            scalar_weights[loss_name] = float(params['weights'][1][loss_name])

        await app['driver'].in_queue.put(m.SetWeights(weights, scalar_weights))

        app['params'] = params
    except KeyError as err:
        error_string = (type(err).__name__ + ': ' + str(err) +
                        ": All required parameters were not found. Please "
                        "don't delete parameters.")
    except Exception as err:  # surfaced to the user, never fatal
        error_string = type(err).__name__ + ': ' + str(err)
    finally:
        send_websocket(app, dict(type='newParams', params=get_params(app),
                                 errorString=error_string))


def init_params(app):
    config = app['config']
    app['content_image'] = Image.open(
        str(ROOT_DIR / config['initial_content'])).convert('RGB')
    app['style_image'] = Image.open(
        str(ROOT_DIR / config['initial_style'])).convert('RGB')
    app['content_thumbnail'] = None
    app['style_thumbnail'] = None
    size = config.getint('initial_size')

    app['params']['size'] = size
    app['style_size'] = size
    app['params']['optimizer'] = 'lbfgs'
    app['params']['optimizer_step_size'] = m.SetOptimizer.step_sizes['lbfgs']
    with open(str(ROOT_DIR / config['initial_weights'])) as w:
        app['params']['weights'] = yaml.safe_load(w)


async def init_arrays(app):
    content = utils.resize_to_fit(app['content_image'], app['params']['size'])
    style = utils.resize_to_fit(app['style_image'], int(app['style_size']))

    reset_state = False
    if app['input_arr'] is None:
        w, h = content.size
        app['input_arr'] = np.uint8(np.random.uniform(0, 255, (h, w, 3)))
        app['input_was_reset'] = True
        reset_state = True
    elif max(app['input_arr'].shape[:2]) != app['params']['size']:
        size = utils.fit_into_square(app['input_arr'].shape[:2],
                                     app['params']['size'])
        app['input_arr'] = utils.resample_hwc(app['input_arr'], size)
        app['input_was_reset'] = False

    await app['driver'].in_queue.put(
        m.SetImages(None, app['input_arr'], np.uint8(content),
                    np.uint8(style), reset_state))
    await app['driver'].in_queue.put(
        m.SetWeights(*app['params']['weights']))


# -- Driver message pump (reference app.py:265-323) ---------------------------

def process_iterate(app, recv_msg):
    import time
    it_time = time.perf_counter()
    if recv_msg.i == 1:
        app['its_per_s'].clear()
    else:
        app['its_per_s'](1 / (it_time - app['last_it_time']))
    app['i'] = recv_msg.i
    app['last_it_time'] = it_time

    step_size = 0
    has_image = recv_msg.image is not None
    if (has_image and recv_msg.i > 1
            and recv_msg.image.shape == app['input_arr'].shape):
        diff = recv_msg.image - np.float32(app['input_arr'])
        step_size = float(np.sqrt(np.mean(diff ** 2)))

    logger.info('iterate %d received, loss: %g, step size: %g',
                recv_msg.i, recv_msg.trace['loss'], step_size)

    if app['running'] and (not app['input_was_reset'] or recv_msg.i == 1):
        if has_image:
            app['input_was_reset'] = False
            app['input_arr'] = recv_msg.image
        send_websocket(app, dict(type='iterateInfo', i=recv_msg.i,
                                 trace=dict(recv_msg.trace),
                                 stepSize=step_size,
                                 itsPerS=app['its_per_s']()))


async def process_messages(app):
    while True:
        recv_msg = await app['driver'].out_queue.get()

        if isinstance(recv_msg, m.Iterate):
            process_iterate(app, recv_msg)

        elif isinstance(recv_msg, m.Shutdown):
            pass  # driver exiting; the supervisor respawns it

        elif isinstance(recv_msg, m.WorkerReady):
            app['worker_ready'] = True
            app['layers'] = recv_msg.layers
            send_websocket(app, dict(type='workerReady'))
            await ping_router_once(app)

        elif isinstance(recv_msg, m.GetImages):
            await init_arrays(app)

        elif isinstance(recv_msg, m.Reset):
            await app['driver'].in_queue.put(m.PauseIteration())
            app['running'] = False
            init_params(app)
            app['input_arr'] = None
            await init_arrays(app)

        else:
            logger.error('Unknown message type received from driver.')


async def reset_session(app):
    """Full session reset (router Reset / control endpoint)."""
    await app['driver'].in_queue.put(m.PauseIteration())
    app['running'] = False
    init_params(app)
    app['input_arr'] = None
    await init_arrays(app)
    send_websocket(app, dict(type='state', running=False))


async def control_reset(request):
    """POST /__control/reset — the router's Reset message as HTTP/JSON
    (replaces the reference's router->app ZMQ socket)."""
    await reset_session(request.app)
    return web.json_response({'ok': True})


# -- Router heartbeat (reference app.py:326-333) ------------------------------

def _router_url(app):
    config = app['config']
    host = config.get('router_host', '')
    port = config.get('router_control_port', '')
    if host and port:
        return 'http://%s:%s' % (host, port)
    return None


async def ping_router_once(app):
    url = _router_url(app)
    if not url or not app['worker_ready']:
        return
    payload = {'addr': 'http://%s:%s/__control/reset'
                       % (app['config']['http_host'],
                          app['config']['http_port']),
               'host': app['config']['http_host'],
               'port': int(app['config']['http_port']),
               'app_id': app['id']}
    try:
        async with aiohttp.ClientSession() as sess:
            await sess.post(url + '/__register', json=payload,
                            timeout=aiohttp.ClientTimeout(total=2))
    except Exception as err:
        logger.debug('router ping failed: %s', err)


async def ping_router(app):
    while True:
        await ping_router_once(app)
        await asyncio.sleep(5)


# -- Driver supervision (reference app.py:336-344) ----------------------------

async def monitor_worker(app):
    """Supervises the driver task: respawns it if it exits (crash or
    user-requested restart) and re-feeds all state. Repeated crashes back
    off exponentially (to 30 s) so an unavailable device doesn't spin."""
    backoff = 0.1
    while True:
        task = app.get('driver_task')
        if task is None or task.done():
            crashed = False
            if task is not None and not task.cancelled():
                exc = task.exception()
                if exc:
                    logger.error('driver task died: %r', exc)
                    crashed = True
            if crashed:
                backoff = min(backoff * 2, 30.0)
                await asyncio.sleep(backoff)
            else:
                backoff = 0.1
            app['running'] = False
            app['worker_ready'] = False
            app['driver'] = Driver(
                app['model_params'],
                precision=app['config'].get('precision', 'float32'),
                use_pallas=app['config'].getboolean('pallas', False),
                steps_per_dispatch=app['config'].getint(
                    'steps_per_dispatch', 1),
                image_every=app['config'].getint('image_every', 1))
            app['driver_task'] = asyncio.ensure_future(app['driver'].run())
            app['pm_task'].cancel()
            app['pm_task'] = asyncio.ensure_future(process_messages(app))
            send_websocket(app, dict(type='state', running=False))
            await init_arrays(app)
        await asyncio.sleep(0.1)


# -- Lifecycle (reference app.py:347-406) --------------------------------------

async def startup_tasks(app):
    app['id'] = os.urandom(8).hex()
    app['wss'] = []
    app['running'] = False
    app['last_it_time'] = 0
    app['its_per_s'] = utils.DecayingMean()
    app['params'] = {}
    app['layers'] = []
    app['input_arr'] = None
    app['input_was_reset'] = False
    app['worker_ready'] = False
    app['i'] = 0

    app['model_params'] = resolve_params(app['config'].get('weights', 'auto'),
                                         ROOT_DIR)
    app['driver'] = Driver(
        app['model_params'],
        precision=app['config'].get('precision', 'float32'),
        use_pallas=app['config'].getboolean('pallas', False),
        steps_per_dispatch=app['config'].getint('steps_per_dispatch', 1),
        image_every=app['config'].getint('image_every', 1))
    app['driver_task'] = asyncio.ensure_future(app['driver'].run())
    app['pm_task'] = asyncio.ensure_future(process_messages(app))

    init_params(app)
    await init_arrays(app)

    app['mw_task'] = asyncio.ensure_future(monitor_worker(app))
    if _router_url(app):
        app['pr_task'] = asyncio.ensure_future(ping_router(app))


async def cleanup_tasks(app):
    url = _router_url(app)
    if url:
        app['pr_task'].cancel()
        try:
            async with aiohttp.ClientSession() as sess:
                await sess.post(url + '/__unregister',
                                json={'app_id': app['id']},
                                timeout=aiohttp.ClientTimeout(total=2))
        except Exception:
            pass
    app['mw_task'].cancel()
    app['pm_task'].cancel()
    await app['driver'].in_queue.put(m.Shutdown())
    task = app.get('driver_task')
    if task is not None:
        try:
            await asyncio.wait_for(task, timeout=5)
        except (asyncio.TimeoutError, asyncio.CancelledError):
            task.cancel()


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
    app.router.add_route('POST', '/__control/reset', control_reset)
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

    # Optional platform override ('cpu', 'tpu', ...) — e.g. CPU development
    # boxes, or when the TPU tunnel is held by another process. Must be set
    # before the first backend use; overrides the axon sitecustomize.
    platform = app['config'].get('platform', '')
    if platform:
        import jax
        jax.config.update('jax_platforms', platform)

    try:
        web.run_app(app, host=app['config']['http_host'],
                    port=int(app['config']['http_port']),
                    shutdown_timeout=1)
    except KeyboardInterrupt:
        pass
    finally:
        logger.info('Shutting down app.')


if __name__ == '__main__':
    main()

"""Router proxy tests against a real (dummy) backend server: cookie-affine
GET/POST forwarding, Set-Cookie passthrough, WS proxying with cookie
forwarding, capacity-aware multiplexing."""

import asyncio
import json

import aiohttp
from aiohttp import web
from aiohttp.test_utils import TestClient, TestServer

from style_transfer2_tpu.serve import router as router_mod


def run(coro, timeout=120):
    return asyncio.run(asyncio.wait_for(coro, timeout))


def make_backend():
    """A dummy app instance exposing the reference surface."""
    app = web.Application()
    app['hits'] = []

    async def root(request):
        app['hits'].append(('GET', str(request.rel_url),
                            dict(request.cookies)))
        resp = web.Response(text='backend-index')
        resp.set_cookie('pool_session', 'backend-cookie')
        return resp

    async def upload(request):
        data = await request.post()
        app['hits'].append(('POST', str(request.rel_url), dict(data)))
        return web.Response(text='uploaded')

    async def websocket(request):
        ws = web.WebSocketResponse()
        await ws.prepare(request)
        # Echo the cookies the proxy forwarded, then echo messages.
        await ws.send_str(json.dumps({'type': 'hello',
                                      'cookies': dict(request.cookies)}))
        async for msg in ws:
            if msg.type == aiohttp.WSMsgType.TEXT:
                await ws.send_str('echo:' + msg.data)
        return ws

    app.router.add_route('GET', '/', root)
    app.router.add_route('GET', '/output', root)
    app.router.add_route('POST', '/upload', upload)
    app.router.add_route('GET', '/websocket', websocket)
    return app


def test_router_proxies_to_backend(tmp_path):
    async def body():
        backend = make_backend()
        backend_server = TestServer(backend)
        await backend_server.start_server()

        import configparser
        config = configparser.ConfigParser()
        config['DEFAULT'] = {'router_session_timeout': '60'}
        router_app = router_mod.init(config=config['DEFAULT'],
                                     state_file=str(tmp_path / 's.json'))
        client = TestClient(TestServer(router_app),
                            cookie_jar=aiohttp.DummyCookieJar())
        await client.start_server()  # startup initializes addrs/sessions

        inst = router_mod.AppInstance(
            'http://127.0.0.1:%d/__control/reset' % backend_server.port,
            '127.0.0.1', backend_server.port, 'be1', capacity=2)
        router_app['addrs'][inst.addr] = inst

        # First GET: assigned a session, proxied body, both cookies arrive.
        resp = await client.get('/')
        assert resp.status == 200
        assert await resp.text() == 'backend-index'
        cookies = {c.key: c.value for c in resp.cookies.values()}
        assert 'session_id' in cookies          # router's affinity cookie
        assert cookies.get('pool_session') == 'backend-cookie'  # passthrough
        sid = cookies['session_id']
        hdr = {'Cookie': 'session_id=%s; pool_session=backend-cookie' % sid}

        # POST forwards form data.
        resp = await client.post('/upload', data={'slot': 'content'},
                                 headers=hdr)
        assert resp.status == 200
        assert backend['hits'][-1][0] == 'POST'
        assert backend['hits'][-1][2]['slot'] == 'content'

        # WS proxying forwards the client's cookies to the backend.
        ws = await client.ws_connect('/websocket', headers=hdr)
        msg = json.loads((await ws.receive()).data)
        assert msg['type'] == 'hello'
        assert msg['cookies'].get('pool_session') == 'backend-cookie'
        await ws.send_str('ping')
        echo = await ws.receive()
        assert echo.data == 'echo:ping'
        await ws.close()

        # Second user fits (capacity 2); third gets 503.
        resp = await client.get('/')
        assert resp.status == 200
        resp = await client.get('/')
        assert resp.status == 503

        # Affine: the first user's later requests reuse the same instance.
        resp = await client.get('/output', headers=hdr)
        assert resp.status == 200
        assert len(router_app['sessions']) == 2

        await client.close()
        await backend_server.close()
    run(body())

"""Control-plane authentication: the app's /__control/reset and the
router's /__register & /__unregister are token-gated when control_token is
configured and loopback-only when it is not (the reference's ZMQ control
channel was unauthenticated; this rebuild's HTTP/JSON one must not be when
it binds beyond loopback)."""

import asyncio
import configparser

import pytest
from aiohttp import web
from aiohttp.test_utils import TestClient, TestServer


def run(coro):
    loop = asyncio.new_event_loop()
    try:
        return loop.run_until_complete(asyncio.wait_for(coro, 300))
    finally:
        loop.close()


def _cfg(**extra):
    cp = configparser.ConfigParser()
    cp['DEFAULT'] = dict({
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
    }, **extra)
    return cp['DEFAULT']


class FakeRequest:
    def __init__(self, headers=None, remote='127.0.0.1'):
        self.headers = headers or {}
        self.remote = remote


def test_check_control_auth_policy():
    from style_transfer2_tpu.serve.session import (
        CONTROL_TOKEN_HEADER, check_control_auth)

    # No token configured: loopback passes, remote peers are rejected.
    cfg = _cfg()
    check_control_auth(FakeRequest(), cfg)
    check_control_auth(FakeRequest(remote='::1'), cfg)
    check_control_auth(FakeRequest(remote=None), cfg)  # unix socket/mocks
    with pytest.raises(web.HTTPForbidden):
        check_control_auth(FakeRequest(remote='10.0.0.5'), cfg)

    # Token configured: the header decides, the peer address does not.
    cfg = _cfg(control_token='sesame')
    with pytest.raises(web.HTTPForbidden):
        check_control_auth(FakeRequest(), cfg)  # missing
    with pytest.raises(web.HTTPForbidden):
        check_control_auth(
            FakeRequest({CONTROL_TOKEN_HEADER: 'wrong'}), cfg)
    check_control_auth(
        FakeRequest({CONTROL_TOKEN_HEADER: 'sesame'}, remote='10.0.0.5'),
        cfg)


def test_router_register_requires_token():
    from style_transfer2_tpu.serve import router as router_mod

    async def body():
        config = _cfg(control_token='sesame')
        app = router_mod.init(config=config, state_file='/dev/null')
        app['addrs'] = {}
        app['sessions'] = {}
        control = router_mod.make_control_app(app)
        client = TestClient(TestServer(control))
        await client.start_server()

        payload = {'addr': 'http://127.0.0.1:9000/__control/reset',
                   'host': '127.0.0.1', 'port': 9000, 'app_id': 'id0'}
        resp = await client.post('/__register', json=payload)
        assert resp.status == 403
        resp = await client.post('/__register', json=payload,
                                 headers={'X-Control-Token': 'wrong'})
        assert resp.status == 403
        assert not app['addrs']
        resp = await client.post('/__register', json=payload,
                                 headers={'X-Control-Token': 'sesame'})
        assert resp.status == 200
        assert len(app['addrs']) == 1

        resp = await client.post('/__unregister', json={'app_id': 'id0'})
        assert resp.status == 403
        assert len(app['addrs']) == 1
        resp = await client.post('/__unregister', json={'app_id': 'id0'},
                                 headers={'X-Control-Token': 'sesame'})
        assert resp.status == 200
        assert not app['addrs']
        await client.close()
    run(body())


def test_app_control_reset_requires_token():
    from style_transfer2_tpu.serve.app import init

    async def body():
        app = init(config=_cfg(control_token='sesame'))
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            resp = await client.post('/__control/reset')
            assert resp.status == 403
            resp = await client.post('/__control/reset',
                                     headers={'X-Control-Token': 'sesame'})
            assert resp.status == 200
            assert (await resp.json())['ok'] is True
        finally:
            await client.close()
    run(body())


def test_router_link_and_reset_delivery_attach_token():
    """Both control-plane clients — the app's registration heartbeat and
    the router's reset delivery — carry the configured token."""
    from style_transfer2_tpu.serve import router as router_mod
    from style_transfer2_tpu.serve.session import RouterLink

    async def body():
        seen = {}

        async def capture(request):
            seen[request.path] = request.headers.get('X-Control-Token')
            return web.json_response({'ok': True})

        target = web.Application()
        target.router.add_route('POST', '/__register', capture)
        target.router.add_route('POST', '/__unregister', capture)
        target.router.add_route('POST', '/__control/reset', capture)
        server = TestServer(target)
        await server.start_server()

        cfg = _cfg(control_token='sesame',
                   router_host='127.0.0.1',
                   router_control_port=str(server.port))
        link = RouterLink(cfg, 'app0', host='127.0.0.1', port=8000)
        await link.register_once()
        await link.unregister()
        assert seen['/__register'] == 'sesame'
        assert seen['/__unregister'] == 'sesame'

        inst = router_mod.AppInstance(
            'http://127.0.0.1:%d/__control/reset' % server.port,
            '127.0.0.1', server.port, 'app0')
        await router_mod.send_reset(inst, cfg)
        assert seen['/__control/reset'] == 'sesame'
        await server.close()
    run(body())

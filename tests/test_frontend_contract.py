"""Frontend behavior-contract verification (no browser/JS runtime exists in
this container, so the rewritten frontend is verified three ways instead of
by DOM execution — VERDICT round-1 item 9's documented fallback):

1. DOM bindings: every element id the rewritten app.js dereferences exists
   in the served index.html — the class of failure a browser smoke test
   would catch first (reference static/app.js:74-185 is the contract).
2. Message-type closure: the set of WS types the server can emit equals the
   set app.js handles equals the reference frontend's set, and likewise for
   the types app.js sends vs the server's dispatch.
3. Live field shapes: drive the real app end-to-end (aiohttp test client)
   and assert every outbound WS payload carries exactly the fields the
   REFERENCE frontend reads (app.js:137-181), with the right JSON types.
"""

import asyncio
import json
import re
from pathlib import Path

import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer

ROOT = Path(__file__).parent.parent
OUR_JS = ROOT / 'style_transfer2_tpu/serve/static/app.js'
OUR_HTML = (ROOT / 'style_transfer2_tpu/serve/templates/index.html',
            ROOT / 'style_transfer2_tpu/serve/templates/base.html')

# What the reference frontend handles/sends (static/app.js:5-33,137-181).
REF_INBOUND = {'iterateInfo', 'newParams', 'newSize', 'state', 'thumbnails',
               'workerReady'}
REF_OUTBOUND = {'applyParams', 'pause', 'reset', 'restartWorker', 'start'}

# Field reads per inbound type in the reference frontend (app.js lines):
# iterateInfo :138-150, newParams :152-154, newSize :156-159, state :161-168,
# thumbnails :170-176, workerReady :178-180.
REF_FIELDS = {
    'iterateInfo': {'i': (int,), 'stepSize': (int, float),
                    'itsPerS': (int, float), 'trace': (dict,)},
    'newParams': {'params': (str,)},           # errorString optional
    'newSize': {'width': (int,), 'height': (int,)},
    'state': {'running': (bool,)},
    'thumbnails': {},                            # content/style optional
    'workerReady': {},
}


def _js():
    return OUR_JS.read_text()


def _html_ids():
    ids = set()
    for path in OUR_HTML:
        ids |= set(re.findall(r'id="([^"]+)"', path.read_text()))
    return ids


def test_dom_bindings_exist():
    """Every $("id") / getElementById target in app.js is present in the
    rendered templates."""
    used = set(re.findall(r'\$\("([\w-]+)"\)', _js()))
    assert used, 'id-lookup pattern not found — test needs updating'
    missing = used - _html_ids()
    assert not missing, 'app.js references ids missing from the templates: %s' % sorted(missing)


def test_ws_type_closure_with_reference():
    js = _js()
    handled = set(re.findall(r'case "(\w+)"', js))
    assert handled == REF_INBOUND, (handled, REF_INBOUND)
    sent = set(re.findall(r'type:\s*"(\w+)"', js))
    assert sent == REF_OUTBOUND, (sent, REF_OUTBOUND)


def test_server_dispatch_closure():
    """The session layer dispatches exactly the reference's outbound set,
    and the server emits only types the frontend handles."""
    session_py = (ROOT / 'style_transfer2_tpu/serve/session.py').read_text()
    dispatched = set(re.findall(r"kind == '(\w+)'", session_py))
    assert dispatched == REF_OUTBOUND, dispatched
    emitted = set()
    for mod in ('session.py', 'app.py', 'pool.py'):
        text = (ROOT / 'style_transfer2_tpu/serve' / mod).read_text()
        emitted |= set(re.findall(r"push\('(\w+)'", text))
        if 'push_state' in text:
            emitted.add('state')
        if 'push_params' in text:
            emitted.add('newParams')
    assert emitted <= REF_INBOUND, emitted - REF_INBOUND


# -- Live protocol shapes ------------------------------------------------------


def _config():
    import configparser
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
def client():
    from style_transfer2_tpu.serve.app import init
    loop = asyncio.new_event_loop()
    asyncio.set_event_loop(loop)
    app = init(config=_config())
    client = TestClient(TestServer(app), loop=loop)
    loop.run_until_complete(client.start_server())
    yield client, loop
    loop.run_until_complete(client.close())
    loop.close()


def _check_fields(msg):
    kind = msg.pop('type')
    spec = REF_FIELDS[kind]
    for field, types in spec.items():
        assert field in msg, '%s missing %r (reference reads it)' % (kind, field)
        assert isinstance(msg[field], types), (kind, field, type(msg[field]))
    if kind == 'iterateInfo':
        # The reference calls .toPrecision on every trace value: all floats.
        assert all(isinstance(v, (int, float)) for v in msg['trace'].values())
        assert 'loss' in msg['trace']
    if kind == 'newParams' and 'errorString' in msg:
        assert isinstance(msg['errorString'], str)
    if kind == 'thumbnails':
        for slot in ('content', 'style'):
            if slot in msg:
                assert msg[slot].startswith('data:image/')


def test_live_ws_payload_shapes(client):
    client, loop = client

    async def body():
        ws = await client.ws_connect('/websocket')
        seen = {}

        async def recv(n=40, until=None):
            for _ in range(n):
                raw = await asyncio.wait_for(ws.receive(), 240)
                msg = json.loads(raw.data)
                kind = msg['type']
                assert kind in REF_INBOUND, kind
                _check_fields(dict(msg))
                seen[kind] = msg
                if until and kind == until:
                    return msg

        # Greeting volley covers workerReady/newParams/newSize/state/thumbnails.
        await recv(until='thumbnails')
        assert {'newParams', 'newSize', 'state'} <= set(seen)

        await ws.send_str(json.dumps({'type': 'start'}))
        info = await recv(until='iterateInfo')
        assert np.isfinite(info['trace']['loss'])

        # A bad params document produces the reference's errorString surface.
        import yaml
        doc = yaml.safe_load(seen['newParams']['params'])
        doc['weights'][0]['style']['not_a_layer'] = 1.0
        await ws.send_str(json.dumps({'type': 'applyParams',
                                      'params': yaml.safe_dump(doc)}))
        for _ in range(200):
            raw = await asyncio.wait_for(ws.receive(), 240)
            msg = json.loads(raw.data)
            if msg['type'] == 'newParams' and msg.get('errorString'):
                assert 'Invalid layer name' in msg['errorString']
                break
        else:
            raise AssertionError('no errorString newParams received')

        await ws.send_str(json.dumps({'type': 'pause'}))
        await ws.close()

    loop.run_until_complete(asyncio.wait_for(body(), 300))

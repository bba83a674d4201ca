"""The serving tier: aiohttp web app, in-process TPU driver, router.

The reference's 3-process topology (app.py / worker.py / router.py over
ZeroMQ with pickled messages) existed because Caffe blocks and pickle was
convenient. Here the worker is an in-process asyncio task owning the device
(driver.py) — JAX's async dispatch replaces the process boundary; messages
are plain dataclasses over asyncio queues; the router control plane is
HTTP/JSON (pickle-over-TCP is a security liability, SURVEY.md §5).
"""

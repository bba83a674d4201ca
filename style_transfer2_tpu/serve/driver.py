"""The TPU driver task — the reference's worker process, in-process.

Replicates Worker's control flow (reference worker.py:318-409): when
running, drain ALL pending messages first (control latency <= 1 iteration),
then take ONE optimizer step and emit an Iterate; when idle, block on the
queue. A fresh driver with incomplete state answers StartIteration with
GetImages so the app re-sends the slots (the bootstrap/crash-recovery
handshake, worker.py:399-401).

Device work (steps, feature forwards) runs on a single executor thread so
the aiohttp event loop never blocks; the driver task is the only mutator of
the StyleTransfer state, so there is no cross-task race by construction
(the same safety argument as the reference's single-threaded worker).
"""

import asyncio
import concurrent.futures
import logging

from ..engine.transfer import StyleTransfer
from . import messages as m

logger = logging.getLogger('driver')


class DeviceTimeoutError(RuntimeError):
    """A device dispatch exceeded dispatch_timeout — the backend (or the
    tunnel to it) is wedged, not merely slow. Raised out of the driver task
    so the app's supervisor respawns the driver with backoff instead of the
    session hanging silently forever."""


async def run_with_watchdog(fut, timeout, describe):
    """Awaits an executor future under the device-hang watchdog: exceeding
    `timeout` seconds raises DeviceTimeoutError. asyncio.shield is
    load-bearing — an executor future can't interrupt its thread, and
    wait_for's cancel would otherwise BLOCK until the wedged call returns;
    shielding lets the timeout fire while the thread is abandoned mid-call.
    timeout <= 0 disables. Shared by both serving tiers."""
    if timeout <= 0:
        return await fut
    try:
        return await asyncio.wait_for(asyncio.shield(fut), timeout)
    except asyncio.TimeoutError:
        logger.error('device call %s exceeded the %.1fs watchdog — '
                     'backend wedged', describe, timeout)
        raise DeviceTimeoutError(
            'device dispatch exceeded %.1fs' % timeout)


class Driver:
    """Owns the device and the StyleTransfer engine; talks to the app over
    a pair of asyncio queues."""

    def __init__(self, params, precision='float32', placement=None,
                 loop=None, use_pallas=False, steps_per_dispatch=1,
                 image_every=1, adaptive_max_steps=0, pipeline_depth=1,
                 dispatch_timeout=0.0, remat=False, prewarm_grids=()):
        """steps_per_dispatch > 1 fuses K optimizer steps per device
        dispatch (lax.scan) for throughput; control latency grows to K
        iterations (the reference guarantee is 1, the default).
        image_every > 1 fetches the iterate snapshot from the device only
        every Nth iteration (Iterate.image is None in between) — the trace
        still streams per iteration, and the browser polls /output at 4 Hz
        regardless, but each skipped fetch saves a host round-trip.
        adaptive_max_steps > 1 enables ADAPTIVE fusing: a dispatch right
        after any control message runs a single step (a user tweak shows
        its effect within one iteration, the reference's latency
        guarantee), and once the control queue goes quiet, dispatches fuse
        adaptive_max_steps iterations each — amortizing the ~0.5 s tunnel
        dispatch cost that otherwise dominates interactive serving.
        pipeline_depth > 1 splits each quiet-phase chunk into depth
        pipelined dispatches kept in flight together (begin_steps is async;
        collect_steps blocks): the tunnel round trip of one sub-chunk hides
        behind the compute of the next, worth ~25% throughput at identical
        worst-case control latency (still adaptive_max_steps iterations of
        in-flight work). Programs compiled per resolution: K=1 plus one per
        distinct sub-chunk length. Default 1: with adaptive off, depth 2
        would silently double in-flight work (worst-case control latency)
        to 2*steps_per_dispatch; app.py opts into depth 2 whenever
        adaptive mode is on.
        dispatch_timeout > 0 (seconds) is the device-hang watchdog: a
        single device call exceeding it raises DeviceTimeoutError out of
        the driver task, so a wedged backend/tunnel becomes a supervised
        driver restart (with backoff) instead of a silent hang. Size it
        WELL above the worst first-compile time for the resolution (remote
        compiles take minutes); 0 disables.
        remat (False / 'conv' / 'block') is the engine's rematerialization
        policy for high-resolution sessions — see StyleTransfer.
        prewarm_grids: (H, W) grids to compile in the background once the
        session is live (StyleTransfer.prewarm on a dedicated executor):
        a later resize to a prewarmed grid skips its minutes-long remote
        compile. The chunk lengths warmed are the ones this driver's
        dispatch policy actually uses (1 plus the adaptive sub-chunk)."""
        self.in_queue = asyncio.Queue()
        self.out_queue = asyncio.Queue()
        self.steps_per_dispatch = max(1, int(steps_per_dispatch))
        self.image_every = max(1, int(image_every))
        self.adaptive_max_steps = max(0, int(adaptive_max_steps))
        self.pipeline_depth = max(1, int(pipeline_depth))
        self.dispatch_timeout = float(dispatch_timeout)
        self.prewarm_grids = [tuple(int(v) for v in hw)
                              for hw in prewarm_grids]
        self._prewarm_task = None
        self._recent_control = False
        self.transfer = StyleTransfer(params, precision=precision,
                                      placement=placement,
                                      use_pallas=use_pallas, remat=remat)
        self.loop = loop or asyncio.get_event_loop()
        # One thread owns all device calls; queue depth 1 keeps ordering.
        self.executor = concurrent.futures.ThreadPoolExecutor(
            max_workers=1, thread_name_prefix='tpu-driver')
        self.should_stop = False

    async def _device(self, fn, *args):
        """Runs a blocking device call off the event loop. With the
        watchdog armed, a call that outlives dispatch_timeout raises
        DeviceTimeoutError (the stuck executor thread is abandoned — a
        fresh Driver brings a fresh executor)."""
        fut = self.loop.run_in_executor(self.executor, fn, *args)
        return await run_with_watchdog(fut, self.dispatch_timeout,
                                       getattr(fn, '__name__', fn))

    async def start(self):
        await self.out_queue.put(m.WorkerReady(layers=self.transfer.layers()))

    def _prewarm_ks(self):
        """The fused chunk lengths this driver's dispatch policy uses."""
        if self.adaptive_max_steps > 1:
            return (1, max(1, self.adaptive_max_steps // self.pipeline_depth))
        if self.steps_per_dispatch > 1:
            return (1, self.steps_per_dispatch)
        return (1,)

    async def _prewarm_loop(self):
        """Background ladder prewarm: compiles the configured grids one at
        a time on a dedicated executor while the session runs. Compilation
        is host/compiler-side, so live step dispatches keep flowing from
        the driver thread; each grid costs one dummy step of device time.
        No watchdog — a prewarm compile taking minutes is the expected
        case, and a wedged backend already trips the live dispatch
        watchdog. Waits for the app to feed the engine first (the
        objective structure defines the programs to warm)."""
        executor = concurrent.futures.ThreadPoolExecutor(
            max_workers=1, thread_name_prefix='prewarm')
        try:
            while not self.transfer.check_consistency():
                if self.should_stop:
                    return
                await asyncio.sleep(0.5)
            ks = self._prewarm_ks()
            for hw in self.prewarm_grids:
                if self.should_stop:
                    return
                if hw == self.transfer.input_hw:
                    continue  # the live grid is already compiled
                try:
                    dt = await self.loop.run_in_executor(
                        executor, self.transfer.prewarm, hw, ks)
                    logger.info('prewarmed %s (chunks %s) in %.1fs',
                                hw, ks, dt)
                except Exception:
                    logger.warning('prewarm of %s failed', hw, exc_info=True)
        except asyncio.CancelledError:
            pass
        finally:
            executor.shutdown(wait=False)

    async def _collect(self, handle):
        """Materializes one in-flight dispatch and emits its Iterates (one
        per fused iteration, sharing the chunk-final snapshot)."""
        image, traces = await self._device(self.transfer.collect_steps,
                                           handle, True)
        for j, tr in enumerate(traces):
            await self.out_queue.put(m.Iterate(
                image, handle.t_end - handle.n_steps + 1 + j, tr.data))

    async def run(self):
        """Main loop, mirroring reference worker.py:338-364 — with the
        fused/pipelined dispatch policy layered on: control messages are
        only applied with no dispatch in flight (Iterate ordering follows
        engine-state ordering), and any control traffic forces the next
        dispatch down to a single step."""
        await self.start()
        if self.prewarm_grids:
            self._prewarm_task = asyncio.ensure_future(self._prewarm_loop())
        in_flight = []   # begin_steps handles, dispatch order

        async def flush():
            while in_flight:
                await self._collect(in_flight.pop(0))

        try:
            while not self.should_stop:
                if self.transfer.is_running:
                    if not self.in_queue.empty():
                        # Settle in-flight work, then drain all pending
                        # control messages.
                        await flush()
                        while not self.in_queue.empty():
                            msg = self.in_queue.get_nowait()
                            if await self.process_message(msg):
                                self.should_stop = True
                                break
                        continue
                    if not self.transfer.check_consistency():
                        await flush()
                        await self.out_queue.put(m.GetImages())
                        # Wait for the app's reply instead of spinning.
                        msg = await self.in_queue.get()
                        if await self.process_message(msg):
                            break
                        continue
                    if self.adaptive_max_steps > 1:
                        # One-step dispatch right after control traffic;
                        # full fused chunks once the queue is quiet.
                        if self._recent_control:
                            k, depth = 1, 1
                            self._recent_control = False
                        else:
                            depth = self.pipeline_depth
                            k = max(1, self.adaptive_max_steps // depth)
                    else:
                        k = self.steps_per_dispatch
                        depth = self.pipeline_depth if k > 1 else 1
                    if k == 1:
                        await flush()
                        # Iterate 1 always carries an image: the app's
                        # input_was_reset guard clears only on an
                        # image-bearing first iterate (app.py parity).
                        t_next = self.transfer.t + 1
                        fetch = (t_next == 1
                                 or t_next % self.image_every == 0)
                        image, trace = await self._device(
                            self.transfer.step, fetch)
                        await self.out_queue.put(
                            m.Iterate(image, self.transfer.t, trace))
                    elif len(in_flight) < depth:
                        # Enqueue another chunk (cheap: async dispatch).
                        in_flight.append(await self._device(
                            self.transfer.begin_steps, k))
                    else:
                        # Pipeline full: settle the oldest chunk.
                        await self._collect(in_flight.pop(0))
                    continue
                await flush()
                msg = await self.in_queue.get()
                if await self.process_message(msg):
                    break
        except asyncio.CancelledError:
            pass
        finally:
            if self._prewarm_task is not None:
                self._prewarm_task.cancel()
            await self.out_queue.put(m.Shutdown())
            self.executor.shutdown(wait=False)

    async def process_message(self, msg):
        """Dispatches one message; returns True on Shutdown
        (reference worker.py:366-409)."""
        self._recent_control = True
        t = self.transfer

        def is_image(obj):
            return obj is not None and not isinstance(obj, int)

        if isinstance(msg, m.SetImages):
            if is_image(msg.input_image):
                await self._device(t.set_input, msg.input_image)
            elif msg.input_image == m.SetImages.RESAMPLE:
                await self._device(t.resample_input, tuple(msg.size))

            if is_image(msg.content_image):
                await self._device(t.set_content, msg.content_image)
            elif msg.content_image == m.SetImages.RESAMPLE:
                await self._device(t.resample_content, tuple(msg.size))

            if is_image(msg.style_image):
                await self._device(t.set_style, msg.style_image)

            if msg.reset_state:
                await self._device(t.reset)

        elif isinstance(msg, m.SetOptimizer):
            # The worker resets when the optimizer INSTANCE doesn't match the
            # class — i.e. on a type change or when none exists yet
            # (reference worker.py:387-391).
            changed = (msg.optimizer != t.optimizer_name
                       or t.opt_state is None)
            t.set_optimizer(msg.optimizer)
            t.set_step_size(msg.step_size)
            if changed:
                await self._device(t.reset)

        elif isinstance(msg, m.SetWeights):
            t.set_weights(msg.weights, msg.params)

        elif isinstance(msg, m.Shutdown):
            return True

        elif isinstance(msg, m.StartIteration):
            if not t.start():
                await self.out_queue.put(m.GetImages())

        elif isinstance(msg, m.PauseIteration):
            t.pause()

        else:
            logger.error('Invalid message received: %r', msg)

        return False

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
import time

import numpy as np

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


class AdaptiveTuner:
    """Sizes fused dispatch chunks from MEASURED step time and dispatch
    round-trip, so control latency tracks a wall-clock target across
    resolutions instead of a hand-tuned iteration count (a 60-iteration
    chunk is ~1 s at 300px and ~11 s at 2048px). Encodes the round-2
    pipelining rule as a live decision: a sub-chunk's device compute must
    cover the dispatch RTT, or depth-2 pipelining LOSES to one big chunk
    (measured: 28 it/s at 2x15 vs 36 at 1x30 over the tunnel).

    Estimation runs as an explicit per-grid CALIBRATION, because the only
    sample kind that cleanly separates step time from dispatch RTT is an
    UNpipelined differential: pipelined collect intervals equal pure chunk
    compute only while the device is genuinely busy, and over a slow link
    with small chunks they are collect-RTT, not compute. (The round-3
    hardware run proved the failure: intervals fed step_s ≈ RTT/k, the
    plan shrank k, which made intervals even more RTT-dominated — a
    death spiral down to dispatch-bound 2-step chunks at 8 it/s on a
    ~5 ms step.)

      phase 'single' — plan() forces 1-step dispatches until one clean
        single wall w1 = rtt + 1·step is recorded (the first dispatch of
        any (grid, k) program pays its XLA compile and is discarded).
      phase 'chunk' — plan() forces one UNpipelined default-k chunk;
        its wall = rtt + k·step paired with w1 yields both estimates
        (the RTT cancels in the difference). A grid change re-enters
        calibration at 'chunk': step_s is grid-bound and resets, rtt_s
        is link-bound and persists, so one chunk wall recalibrates.
      phase 'run' — normal planning. Pipelined collect intervals keep
        step_s tracking drift, but a sample is accepted only if it would
        not raise step_s by more than 50% — an idle-device interval
        (≈ RTT) can therefore never contaminate the estimate. Eight
        consecutive rejections force recalibration ('chunk'), so if the
        estimate ever goes stale the tuner heals itself with one
        unpipelined chunk instead of trusting poisoned samples.

    Chunk lengths are quantized to a fixed ladder — every distinct scan
    length is its own XLA program, so free-running lengths would compile
    dozens of variants per grid."""

    LADDER = (1, 2, 4, 8, 15, 30, 60, 120, 240)
    MAX_INTERVAL_REJECTS = 8

    def __init__(self, latency_target, alpha=0.35):
        self.latency_target = float(latency_target)
        self.alpha = float(alpha)
        self.step_s = None
        self.rtt_s = None
        self._w1_last = None
        self._grid = None
        self._phase = 'single'
        self._rejects = 0
        # (grid, k) programs already run once: the FIRST dispatch of a
        # program pays its XLA compile (seconds to minutes) inside the
        # measured wall, so that sample is discarded, not averaged.
        self._seen = set()

    def _ewma(self, old, value):
        return value if old is None else old + self.alpha * (value - old)

    def _first_run(self, k):
        key = (self._grid, k)
        if key in self._seen:
            return False
        self._seen.add(key)
        return True

    def note_grid(self, hw):
        if hw != self._grid:
            self._grid = hw
            self.step_s = None
            self._w1_last = None
            self._rejects = 0
            # rtt persists across grids (a property of the link); with it
            # known, one unpipelined chunk wall recalibrates step directly.
            self._phase = 'chunk' if self.rtt_s is not None else 'single'

    def note_single_wall(self, wall):
        """A blocking single-step dispatch took `wall` = rtt + 1 step."""
        if self._first_run(1):
            return
        self._w1_last = wall
        if self.step_s is not None:
            self.rtt_s = self._ewma(self.rtt_s, max(0.0, wall - self.step_s))
        if self._phase == 'single':
            self._phase = 'chunk'

    def note_chunk_wall(self, k, wall):
        """An UNpipelined k-chunk dispatch-to-collect took `wall` =
        rtt + k steps: paired with a single-step wall (or a known rtt) it
        separates step from RTT — the calibration sample."""
        if self._first_run(k):
            return
        if k <= 1:
            return
        step = None
        if self._w1_last is not None:
            # Differential: the RTT cancels between the two walls. RTT
            # jitter can swamp the compute delta (negative step) — skip
            # the sample and wait for the next chunk wall.
            d = (wall - self._w1_last) / (k - 1)
            step = d if d > 0 else None
        elif self.rtt_s is not None:
            d = (wall - self.rtt_s) / k
            step = d if d > 0 else None
        if step is not None:
            self.step_s = self._ewma(self.step_s, step)
            if self._w1_last is not None:
                self.rtt_s = self._ewma(
                    self.rtt_s, max(0.0, self._w1_last - step))
            self._phase = 'run'
            self._rejects = 0

    def note_chunk_interval(self, k, interval):
        """Consecutive PIPELINED collections `interval` apart. Pure chunk
        compute only if the device stayed busy across the gap, so accept
        the sample only inside a symmetric plausibility band (within 1.5x
        of step_s either way): genuine drift tracks; an idle-device
        (RTT-dominated) interval cannot inflate the estimate; a spuriously
        SHORT interval (back-to-back collects after a queue stall) cannot
        deflate it and balloon planned chunks past the latency target.
        Persistent rejection on either side triggers recalibration."""
        if self._first_run(k):
            return
        if k <= 0 or interval <= 0 or self._phase != 'run':
            return
        cand = interval / k
        if self.step_s is not None and not (
                self.step_s / 1.5 <= cand <= 1.5 * self.step_s):
            self._rejects += 1
            if self._rejects >= self.MAX_INTERVAL_REJECTS:
                self._phase = 'chunk'   # heal via one unpipelined chunk
                self._rejects = 0
            return
        self._rejects = 0
        self.step_s = self._ewma(self.step_s, cand)

    @classmethod
    def _ladder_floor(cls, k):
        best = cls.LADDER[0]
        for v in cls.LADDER:
            if v <= k:
                best = v
        return best

    def plan(self, default_k, depth_cap):
        """(k, depth) for the next quiet-queue dispatch. During
        calibration the plan IS the measurement schedule: single-step
        dispatches until a clean w1, then one unpipelined default chunk."""
        if not self.latency_target:
            return default_k, depth_cap
        if self._phase == 'single':
            return 1, 1
        if self._phase == 'chunk':
            return (default_k if default_k > 1 else self.LADDER[5]), 1
        # The settle of an in-flight dispatch pays one collect RTT on top
        # of the compute, so that much comes off the latency budget —
        # floored at a quarter of the target so a link whose RTT exceeds
        # the target degrades to small-but-sane chunks instead of
        # collapsing to 1-step dispatches.
        budget = self.latency_target
        if self.rtt_s is not None:
            budget = max(self.latency_target - self.rtt_s,
                         0.25 * self.latency_target)
        total = max(1, int(budget / self.step_s))
        k = self._ladder_floor(max(1, total // max(1, depth_cap)))
        depth = depth_cap
        if depth > 1 and self.rtt_s is not None \
                and k * self.step_s <= self.rtt_s:
            # Sub-chunks too small to hide the RTT: one big chunk wins
            # (round-2 measured rule).
            depth = 1
            k = self._ladder_floor(total)
        return k, depth


class Driver:
    """Owns the device and the StyleTransfer engine; talks to the app over
    a pair of asyncio queues."""

    def __init__(self, params, precision='float32', placement=None,
                 loop=None, use_pallas=False, steps_per_dispatch=1,
                 image_every=1, adaptive_max_steps=0, pipeline_depth=1,
                 dispatch_timeout=0.0, remat=False, prewarm_grids=(),
                 adaptive_latency_target=0.0):
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
        dispatch policy actually uses (1 plus the adaptive sub-chunk).
        adaptive_latency_target > 0 (seconds, requires adaptive mode)
        AUTO-TUNES the quiet-phase chunking from measured step time and
        dispatch RTT (AdaptiveTuner): total in-flight work targets that
        many seconds of wall clock at the current resolution, and
        pipelining turns itself off when sub-chunk compute can't cover
        the RTT. adaptive_max_steps then only seeds the pre-measurement
        default; chunk lengths come from AdaptiveTuner.LADDER."""
        self.in_queue = asyncio.Queue()
        self.out_queue = asyncio.Queue()
        self.steps_per_dispatch = max(1, int(steps_per_dispatch))
        self.image_every = max(1, int(image_every))
        self.adaptive_max_steps = max(0, int(adaptive_max_steps))
        self.pipeline_depth = max(1, int(pipeline_depth))
        self.dispatch_timeout = float(dispatch_timeout)
        self.prewarm_grids = [tuple(int(v) for v in hw)
                              for hw in prewarm_grids]
        # Dynamic prewarm feed: seeded with prewarm_grids at startup;
        # m.Prewarm messages (the serving ladder) append mid-session.
        self._prewarm_queue = asyncio.Queue()
        self._prewarm_task = None
        self._recent_control = False
        self.tuner = None
        if adaptive_latency_target > 0 and self.adaptive_max_steps > 1:
            self.tuner = AdaptiveTuner(adaptive_latency_target)
        self._last_collect_end = None
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
            k = max(1, self.adaptive_max_steps // self.pipeline_depth)
            if self.tuner is not None:
                # Warm both the calibration chunk (default k) and the
                # tuner's current plan, deduplicated in order.
                kt, _ = self.tuner.plan(k, self.pipeline_depth)
                return tuple(dict.fromkeys((1, k, kt)))
            return (1, k)
        if self.steps_per_dispatch > 1:
            return (1, self.steps_per_dispatch)
        return (1,)

    async def _prewarm_loop(self):
        """Background prewarm: compiles queued grids one at a time on a
        dedicated executor while the session runs. Compilation is
        host/compiler-side, so live step dispatches keep flowing from
        the driver thread; each grid costs one dummy step of device time.
        No watchdog — a prewarm compile taking minutes is the expected
        case, and a wedged backend already trips the live dispatch
        watchdog. Waits for the app to feed the engine first (the
        objective structure defines the programs to warm). The queue is
        seeded with prewarm_grids and stays open for m.Prewarm appends
        (the serving ladder's next-rung compile)."""
        executor = concurrent.futures.ThreadPoolExecutor(
            max_workers=1, thread_name_prefix='prewarm')
        try:
            while not self.transfer.check_consistency():
                if self.should_stop:
                    return
                await asyncio.sleep(0.5)
            while not self.should_stop:
                hw = await self._prewarm_queue.get()
                if hw == self.transfer.input_hw:
                    continue  # the live grid is already compiled
                ks = self._prewarm_ks()
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

    def _queue_prewarm(self, grids):
        """Enqueues grids for background compilation and lazily starts the
        prewarm loop."""
        for hw in grids:
            self._prewarm_queue.put_nowait(tuple(int(v) for v in hw))
        if self._prewarm_task is None or self._prewarm_task.done():
            self._prewarm_task = asyncio.ensure_future(self._prewarm_loop())

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
            self._queue_prewarm(self.prewarm_grids)
        in_flight = []   # (begin_steps handle, enqueue time), dispatch order

        async def flush():
            while in_flight:
                await self._collect(in_flight.pop(0)[0])
            self._last_collect_end = None

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
                            if self.tuner is not None:
                                self.tuner.note_grid(self.transfer.input_hw)
                                k, depth = self.tuner.plan(k, depth)
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
                        t0 = time.perf_counter()
                        image, trace = await self._device(
                            self.transfer.step, fetch)
                        if self.tuner is not None:
                            self.tuner.note_grid(self.transfer.input_hw)
                            self.tuner.note_single_wall(
                                time.perf_counter() - t0)
                        await self.out_queue.put(
                            m.Iterate(image, self.transfer.t, trace))
                    elif len(in_flight) < depth:
                        # Enqueue another chunk (cheap: async dispatch).
                        handle = await self._device(
                            self.transfer.begin_steps, k)
                        in_flight.append((handle, time.perf_counter()))
                    else:
                        # Pipeline full: settle the oldest chunk.
                        handle, t_begin = in_flight.pop(0)
                        await self._collect(handle)
                        now = time.perf_counter()
                        if self.tuner is not None:
                            if in_flight and \
                                    self._last_collect_end is not None:
                                # Device saturated since the previous
                                # collect: the gap is pure chunk compute.
                                self.tuner.note_chunk_interval(
                                    handle.n_steps,
                                    now - self._last_collect_end)
                            elif not in_flight:
                                # Unpipelined: wall = RTT + k steps.
                                self.tuner.note_chunk_wall(
                                    handle.n_steps, now - t_begin)
                        self._last_collect_end = now
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
        if isinstance(msg, m.Prewarm):
            # Pure background-compile request: doesn't touch engine state,
            # so it must not drop the next dispatch to a single step.
            self._queue_prewarm(msg.grids)
            return False
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
            elif msg.t0:
                # Continue the session's iterate numbering (a fresh engine's
                # first set_input resets t to 0; the user's counter should
                # survive an engine respawn just like the iterate does).
                t.t = int(msg.t0)
            if msg.norms and not msg.reset_state:
                # Seed the session's first-eval gradient-RMS norms so a
                # respawned engine continues the SAME normalized objective
                # instead of re-anchoring at the live iterate (norms are
                # write-once per reset epoch, so the app's capture is
                # always current). np scalars, not python floats: a weak-
                # typed f32 would miss the jit cache.
                nv, ns = msg.norms
                t.norm_vals.update(
                    {k: np.float32(v) for k, v in nv.items()})
                t.norm_set.update(
                    {k: np.bool_(bool(v)) for k, v in ns.items()})

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

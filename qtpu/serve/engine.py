"""Sharded serving engine with continuous batching.

The runtime layer the reference never had (SURVEY.md §1.3 N8; mount empty,
§0) — required by the north star [B]: "continuous batching of inference
requests across hosts, quantized weights tensor-sharded over the mesh".

Design (TPU-idiomatic):

* frozen integer weights are placed once with TP shardings
  (``qtpu.parallel.mesh``); the jitted forward is compiled per batch *bucket*
  (static shapes — no dynamic batching recompiles);
* a scheduler thread drains the request queue, packs requests into the
  smallest covering bucket (padding the tail), runs the sharded forward, and
  resolves per-request futures — classic continuous batching;
* all device work happens on the scheduler thread; submitters only enqueue;
* metrics: images/sec, request p50/p99 latency, batch occupancy
  (SURVEY.md §5.5).

Multi-host ("continuous batching across hosts", the north-star phrase [B]):
after ``qtpu.parallel.distributed.initialize_from_env()`` brings up N
processes, every host runs this same engine over the *global* mesh and takes
requests into its local queue.  Scheduler rounds run in lockstep — each
round the hosts all-gather their pending counts (one scalar collective,
which doubles as the round barrier), agree on the smallest covering global
bucket, and each contributes its process-local shard of the batch
(``local_batch_to_global``); XLA runs the sharded forward over ICI/DCN and
each host resolves only its own futures.  No host ever materializes another
host's images.  Exercised end-to-end by tests/test_multihost.py with two
real OS processes over the gloo CPU backend.
"""
from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from qtpu.parallel.distributed import local_batch_to_global
from qtpu.parallel.mesh import batch_sharding, make_mesh, shard_variables


class ServingEngine:
    """Continuous-batching inference engine over a device mesh."""

    def __init__(self, model, serve_vars: Dict[str, Any], *,
                 mesh=None, batch_buckets: Sequence[int] = (1, 2, 4, 8, 16, 32),
                 max_wait_ms: float = 2.0, forward_fn=None,
                 forward_factory=None, max_queue: int = 4096,
                 preprocess_fn=None, raw_dtype=np.float32,
                 round_timeout_s: Optional[float] = None,
                 pipeline: bool = True):
        """``model``/``serve_vars``: a frozen SERVE module + variables.

        ``forward_fn(variables, batch) -> logits`` overrides the module apply.

        ``forward_factory(sharded_vars) -> fn(batch)`` builds a forward from
        the TP-SHARDED variables *outside* jit — the route for flat engines
        whose constructors read concrete metadata (e.g.
        ``lambda sv: ResNetInt8Engine(sv, arch)._forward``): the captured
        sharded weights keep their placements inside the jitted call.

        ``preprocess_fn(host_batch) -> device_batch`` runs HOST-SIDE on the
        packed (B, H, W, C) batch right before upload — the int8-ingest hook:
        with ``raw_dtype=np.uint8`` and a fused normalize+quantize preprocess
        (``qtpu.data.native.preprocess_quantize`` onto the flat engine's
        ``stem_grid()``), the wire + PCIe transfer is int8 codes — 4x less
        than f32 images (the measured latency bottleneck on tunneled hosts,
        BASELINE.md round-2 latency table).  The forward must then accept
        codes (e.g. ``ResNetInt8Engine.forward_codes``); see
        ``qtpu.serve.cli.build_engine(uint8_ingest=True)``.

        ``pipeline`` (single-host scheduler): double-buffer scheduler
        rounds — batch k+1 is collected, host-preprocessed, and uploaded
        while the device still computes batch k (JAX async dispatch; only
        the RESOLVE step blocks, one round behind).  This overlaps the
        host→device transfer (77 MB per f32 B=128 round) and host-side
        packing with device compute — the round-4 verdict's last unmeasured
        serving layer (the serial upload→forward→sync loop).  When the
        queue is empty the pending round resolves immediately, so sparse
        traffic sees no added latency; under saturation results resolve one
        round late while throughput approaches the bare-forward rate
        (measured: scripts/chip_engine_saturation_bench.py).  The
        multi-host lockstep loop keeps serial rounds (the pending-count
        allgather is the round barrier by design).

        ``round_timeout_s`` (multi-host only): deadline for one lockstep
        round (allgather + forward).  The lockstep allgather doubles as the
        round barrier, so a wedged/dead peer would otherwise block every
        healthy host's scheduler forever with no health signal (SURVEY §5.3
        scopes recovery to restart-on-failure — but silent hangs must still
        become *detectable* failures).  A watchdog thread turns an overdue
        round into failed futures + ``healthy == False`` (→ /healthz 503);
        the stuck collective itself cannot be cancelled (daemon thread), so
        the process should then be restarted by its supervisor.
        """
        self.model = model
        self._preprocess = preprocess_fn
        self._raw_dtype = np.dtype(raw_dtype)
        self._pipeline = bool(pipeline)
        self._busy_mark = 0.0          # end of last accounted busy interval
        self._round_timeout_s = round_timeout_s
        self._round_start: Optional[float] = None
        self._inflight: list = []
        self.mesh = mesh if mesh is not None else make_mesh(tp=1)
        self.vars = shard_variables(serve_vars, self.mesh)
        if forward_factory is not None:
            if forward_fn is not None:
                raise ValueError("pass forward_fn OR forward_factory")
            inner = forward_factory(self.vars)
            forward_fn = lambda _v, x: inner(x)
        # batch buckets must shard over the 'data' axis: round each up to a
        # multiple of dp (padding fills the difference at dispatch time)
        dp = self.mesh.shape["data"]
        self._procs = jax.process_count()
        if self._procs > 1 and dp % self._procs:
            raise ValueError(
                f"multi-host serving needs the 'data' axis ({dp}) divisible "
                f"by the process count ({self._procs})")
        self.buckets = tuple(sorted({-(-b // dp) * dp for b in batch_buckets}))
        self.max_wait_s = max_wait_ms / 1e3
        self._x_sharding = batch_sharding(self.mesh)
        fwd = forward_fn if forward_fn is not None else model.apply
        if self._procs > 1:
            # multi-host: every process must end up with the full logits for
            # its own batch rows — keep the output sharded over 'data' only
            # (model-axis shards of the last dense would otherwise leave each
            # host with a slice of every row).
            self._fwd = jax.jit(fwd, out_shardings=self._x_sharding)
        else:
            self._fwd = jax.jit(fwd)
        # Bounded queue: submit() blocks once max_queue requests are pending
        # (backpressure instead of unbounded memory growth).
        self._queue: "queue.Queue[Optional[Tuple[np.ndarray, Future, float]]]" \
            = queue.Queue(maxsize=max_queue)
        self._stats_lock = threading.Lock()
        # bounded: stats() reports over this window anyway, and an
        # append-only list would grow without bound on a long-lived server
        from collections import deque

        self._latencies: "deque" = deque(maxlen=10_000)
        self._images = 0
        self._batches = 0
        self._occupancy = 0.0
        self._busy_s = 0.0
        self._img_shape: Optional[Tuple[int, ...]] = None
        self._started = time.monotonic()
        self._stop = threading.Event()
        self._error: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._loop_guarded,
                                        daemon=True)
        self._thread.start()
        if self._procs > 1 and round_timeout_s:
            threading.Thread(target=self._watchdog, daemon=True,
                             name="qtpu-round-watchdog").start()

    # ---- client API -----------------------------------------------------

    def submit(self, image: np.ndarray) -> Future:
        """Enqueue one image (H, W, C); resolves to its logits.

        Validation happens HERE, per request, so one malformed client
        input raises to its own caller instead of reaching the scheduler
        — where it would fail a whole packed round (and, multi-host,
        make hosts compile divergent programs in one lockstep round).
        dtype coercion follows numpy "same_kind" (f64→f32 fine; a float
        image into a uint8-ingest engine is refused, not truncated)."""
        if self._stop.is_set():
            raise RuntimeError("ServingEngine is stopped") from self._error
        image = np.asarray(image)
        if image.dtype != self._raw_dtype:
            if not np.can_cast(image.dtype, self._raw_dtype,
                               casting="same_kind"):
                raise ValueError(
                    f"request dtype {image.dtype} does not match the "
                    f"engine's ingest dtype {self._raw_dtype} (refusing "
                    "unsafe cast; for uint8 ingest send 0-255 pixels)")
            image = image.astype(self._raw_dtype)
        # learn-or-validate atomically: two concurrent FIRST requests with
        # different shapes must not both pass the None check (warmup() pins
        # the shape up front on the CLI path; embedded engines learn here)
        with self._stats_lock:
            if self._img_shape is None:
                self._img_shape = tuple(image.shape)
            elif tuple(image.shape) != self._img_shape:
                raise ValueError(
                    f"request shape {tuple(image.shape)} does not match the "
                    f"engine's image shape {self._img_shape}")
        fut: Future = Future()
        self._queue.put((image, fut, time.monotonic()))
        # a blocking put can complete AFTER the scheduler died and ran its
        # one-shot drain — re-check and drain again so no caller is left
        # waiting on a future nothing will ever resolve
        if self._stop.is_set():
            self._drain_queue()
        return fut

    def predict(self, images: np.ndarray) -> np.ndarray:
        """Synchronous convenience: submit a batch, wait for all results."""
        futs = [self.submit(im) for im in images]
        return np.stack([f.result() for f in futs])

    def warmup(self, image_shape: Tuple[int, int, int]) -> None:
        """Compile every bucket ahead of time (collective in multi-host)."""
        self._img_shape = tuple(image_shape)
        for b in self.buckets:
            x = self._upload(np.zeros((b // self._procs, *image_shape),
                                      self._raw_dtype))
            jax.block_until_ready(self._fwd(self.vars, x))

    def _upload(self, imgs: np.ndarray) -> jax.Array:
        """Host preprocess (e.g. normalize+quantize to int8 codes), then
        place the batch on the mesh ('data'-sharded)."""
        if self._preprocess is not None:
            imgs = self._preprocess(imgs)
        return local_batch_to_global(np.ascontiguousarray(imgs),
                                     self._x_sharding)

    def stats(self) -> Dict[str, float]:
        with self._stats_lock:
            lat = sorted(self._latencies)     # deque(maxlen=10k) window
            n = len(lat)
            elapsed = time.monotonic() - self._started
            return {
                "images": self._images,
                "batches": self._batches,
                # wall-clock rate includes idle time between requests; the
                # busy rate divides by device time only and is the number
                # comparable to the bench harness throughput.
                "images_per_sec": self._images / elapsed if elapsed else 0.0,
                "images_per_sec_busy": (self._images / self._busy_s
                                        if self._busy_s else 0.0),
                "p50_ms": lat[n // 2] * 1e3 if n else 0.0,
                "p99_ms": lat[min(n - 1, int(n * 0.99))] * 1e3 if n else 0.0,
                "mean_occupancy": self._occupancy / max(self._batches, 1),
            }

    def stop(self) -> None:
        self._stop.set()
        self._queue.put(None)
        self._thread.join(timeout=30 if self._procs > 1 else 10)
        self._drain_queue()

    def _drain_queue(self) -> None:
        # Requests still queued (or raced past the _stop check in submit)
        # must not leave callers blocked on their futures forever.
        err = RuntimeError("ServingEngine stopped")
        if self._error is not None:
            err.__cause__ = self._error
        while True:
            try:
                item = self._queue.get_nowait()
            except queue.Empty:
                break
            if item is not None:
                item[1].set_exception(err)

    # ---- scheduler ------------------------------------------------------

    def _loop_guarded(self) -> None:
        """Failure detection (SURVEY §5.3): a crash anywhere in the
        scheduler (device OOM, bad input shape, comm failure) must not
        leave callers blocked on futures forever — record the error, fail
        every in-flight and queued future with it, and mark the engine
        unhealthy so /healthz and submit() surface it."""
        try:
            self._loop()
        except BaseException as e:  # noqa: BLE001 — anything kills serving
            self._error = e
            self._stop.set()
            # futures that left the queue but were never resolved (the
            # raising round's futures were already failed at the raise
            # site — fut.done() guards the double-set)
            for _, fut, _ in list(self._inflight):
                if not fut.done():
                    fut.set_exception(e)
            self._inflight = []
            self._drain_queue()

    @property
    def healthy(self) -> bool:
        """False once the scheduler has died or the engine was stopped."""
        return self._error is None and not self._stop.is_set()

    @staticmethod
    def _round_in_flight(pending) -> bool:
        """True while a dispatched round's device result is still computing
        (non-blocking readiness probe; conservative False if unsupported)."""
        if pending is None:
            return False
        try:
            return not pending[2].is_ready()
        except AttributeError:
            return False

    def _bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if b >= n:
                return b
        return self.buckets[-1]

    def _loop(self) -> None:
        """Single-host scheduler.

        With ``pipeline=True`` (default) rounds are double-buffered: batch
        k+1 is collected/preprocessed/uploaded and its forward DISPATCHED
        (JAX async) while batch k's results are still being computed; only
        the resolve step (device sync + download + future completion) runs
        one round behind.  An empty queue resolves the pending round
        immediately, so the pipeline adds no latency to sparse traffic.
        ``self._inflight`` always holds every future not yet resolved so
        the guarded wrapper can fail them on a scheduler crash.
        """
        if self._procs > 1:
            self._loop_multihost()
            return
        max_b = self.buckets[-1]
        pending = None                  # (batch, bucket, out_device, t_run)
        while not self._stop.is_set():
            try:
                first = (self._queue.get_nowait() if pending is not None
                         else self._queue.get(timeout=0.1))
            except queue.Empty:
                if pending is not None:
                    self._resolve_round(*pending)
                    pending = None
                    self._inflight = []
                continue
            if first is None:
                break
            batch = [first]
            deadline = time.monotonic() + self.max_wait_s
            while len(batch) < max_b:
                # Fill policy: past the deadline, dispatch — UNLESS a round
                # is still computing on device, in which case keep topping
                # up (dispatching early gains nothing while the device is
                # busy, and partial buckets pad to full upload size; the
                # first saturation measurement showed exactly this
                # partial-batch regression).
                past = time.monotonic() >= deadline
                if past and not self._round_in_flight(pending):
                    break
                timeout = (5e-4 if past
                           else max(deadline - time.monotonic(), 5e-4))
                try:
                    item = self._queue.get(timeout=timeout)
                except queue.Empty:
                    continue
                if item is None:
                    self._stop.set()
                    break
                batch.append(item)
            # every unresolved future is tracked in _inflight so the guarded
            # wrapper / a crash can fail them (they have left the queue)
            self._inflight = list(batch) + (list(pending[0])
                                            if pending else [])
            try:
                dispatched = self._dispatch_round(batch)
            except BaseException:
                # round k+1 failed to dispatch, but round k's results are
                # already computed on device — deliver them before letting
                # the guarded wrapper fail the engine, so k's clients get
                # their logits rather than k+1's unrelated error.
                if pending is not None:
                    self._resolve_round(*pending)
                    self._inflight = []
                raise
            if pending is not None:
                self._resolve_round(*pending)
            pending = dispatched
            self._inflight = list(pending[0])
            if not self._pipeline:
                self._resolve_round(*pending)
                pending = None
                self._inflight = []
        if pending is not None:
            self._resolve_round(*pending)
            self._inflight = []

    def _dispatch_round(self, batch):
        """Pack, preprocess, upload, and ASYNC-dispatch one forward; returns
        the pending round.  Failures fail this batch's futures and raise.

        Packing goes through qtpu.data.native.pack_batch: ONE copy into the
        zero-padded bucket buffer (stack-then-concatenate paid a second
        copy on padded rounds).  A B=128 f32 round is ~77 MB ≈ the device
        step time on a direct-attach host, so the pack is on the critical
        path; the measured verdict on parallel memcpy lives in
        pack_batch's docstring (host is DRAM-bandwidth-bound — the win is
        the removed copy, not threads)."""
        from qtpu.data.native import pack_batch

        n = len(batch)
        b = self._bucket_for(n)
        try:
            # dtype/shape pinned to the engine's ingest contract (submit()
            # already validated each image; this keeps pack_batch's checks
            # anchored to the engine, not to whichever image came first)
            imgs = pack_batch([item[0] for item in batch[:b]], pad_to=b,
                              dtype=self._raw_dtype, shape=self._img_shape)
            t_run = time.monotonic()
            x = self._upload(imgs)
            out = self._fwd(self.vars, x)       # async dispatch — no sync
        except BaseException as e:
            for _, fut, _ in batch:
                fut.set_exception(e)
            raise
        # overflow beyond the largest bucket: requeue (shouldn't happen since
        # the loop caps collection at max bucket size)
        for item in batch[b:]:
            self._queue.put(item)
        return batch[:b], b, out, t_run

    def _resolve_round(self, batch, b, out_dev, t_run) -> None:
        """Sync + download one dispatched round and complete its futures."""
        try:
            out = np.asarray(jax.block_until_ready(out_dev))
        except BaseException as e:
            for _, fut, _ in batch:
                fut.set_exception(e)
            raise
        now = time.monotonic()
        with self._stats_lock:
            self._images += len(batch)
            self._batches += 1
            self._occupancy += len(batch) / b
            # busy time = union of in-flight intervals (rounds overlap under
            # the pipelined scheduler; summing per-round spans would double
            # count the overlap)
            self._busy_s += now - max(t_run, self._busy_mark)
            self._busy_mark = now
            for _, _, t0 in batch:
                self._latencies.append(now - t0)
        for i, (_, fut, _) in enumerate(batch):
            fut.set_result(out[i])

    # ---- multi-host lockstep scheduler --------------------------------

    def _loop_multihost(self) -> None:
        """Continuous batching across hosts (module docstring).

        The per-round ``process_allgather`` of (pending, stop) doubles as
        the round barrier: every host blocks there until all hosts arrive,
        so the SPMD forwards below are issued in lockstep by construction.
        """
        from jax.experimental import multihost_utils

        max_local = self.buckets[-1] // self._procs
        while True:
            batch = []
            deadline = time.monotonic() + self.max_wait_s
            while len(batch) < max_local:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    item = self._queue.get(timeout=remaining)
                except queue.Empty:
                    break
                if item is None:
                    self._stop.set()
                    break
                batch.append(item)
            # round deadline bookkeeping: the watchdog fails these futures
            # and marks the engine unhealthy if the round exceeds
            # round_timeout_s (a wedged peer blocks the allgather forever).
            self._inflight = batch
            self._round_start = time.monotonic()
            state = multihost_utils.process_allgather(
                np.array([len(batch), int(self._stop.is_set())], np.int32))
            if self._error is not None:      # watchdog fired mid-collective
                return
            n_max = int(state[:, 0].max())
            if n_max > 0:
                self._run_batch_multihost(batch, n_max)
            self._round_start = None
            self._inflight = []
            if bool(state[:, 1].any()):
                self._stop.set()
                self._drain_queue()
                return

    def _watchdog(self) -> None:
        """Fail silently-hung lockstep rounds (multi-host, round_timeout_s).

        Runs beside the scheduler; when the current round is overdue it
        records a TimeoutError, fails the round's in-flight futures and the
        queue, and flips ``healthy`` — the stuck scheduler thread itself
        stays blocked in the collective (uncancellable) but no caller hangs
        and /healthz turns 503 so a supervisor can restart the process.
        """
        period = max(0.05, min(1.0, self._round_timeout_s / 4))
        while not self._stop.is_set():
            time.sleep(period)
            start = self._round_start
            if start is None:
                continue
            overdue = time.monotonic() - start - self._round_timeout_s
            if overdue <= 0:
                continue
            err = TimeoutError(
                f"multi-host lockstep round exceeded round_timeout_s="
                f"{self._round_timeout_s}s (a peer host is wedged or dead; "
                f"restart the slice)")
            self._error = err
            self._stop.set()
            for _, fut, _ in list(self._inflight):
                if not fut.done():
                    fut.set_exception(err)
            self._drain_queue()
            return

    @staticmethod
    def _local_rows(out_g: jax.Array) -> np.ndarray:
        """This host's batch rows from a P('data')-sharded global output.

        The output is REPLICATED over the 'model' axis, so with tp>1 each
        data row-range appears in ``addressable_shards`` once per model
        shard — concatenating them raw would duplicate rows and hand row
        range k's clients range 0's logits.  Keep exactly one shard per
        distinct data offset, in offset order.
        """
        seen: Dict[int, Any] = {}
        for s in out_g.addressable_shards:
            k = s.index[0].start or 0
            if k not in seen:
                seen[k] = s.data
        return np.concatenate([np.asarray(seen[k]) for k in sorted(seen)])

    def _run_batch_multihost(self, batch, n_max: int) -> None:
        n = len(batch)
        b = self._bucket_for(n_max * self._procs)     # global bucket
        b_local = b // self._procs
        if self._img_shape is None:
            raise RuntimeError(
                "multi-host serving requires warmup() before the first "
                "request round (fixes the image shape on idle hosts)")
        local = [item[0] for item in batch[:b_local]]
        if local:
            from qtpu.data.native import pack_batch

            # dtype/shape pinned to the engine contract: every host must
            # upload the same dtype/shape in a lockstep round (submit()
            # validates per request; idle hosts zero-fill below)
            imgs = pack_batch(local, pad_to=b_local,
                              dtype=self._raw_dtype, shape=self._img_shape)
        else:   # idle host contributing an all-padding shard this round
            imgs = np.zeros((b_local, *self._img_shape), self._raw_dtype)
        t_run = time.monotonic()
        try:
            x = self._upload(imgs)
            out_g = jax.block_until_ready(self._fwd(self.vars, x))
        except BaseException as e:
            for _, fut, _ in batch:
                fut.set_exception(e)
            raise
        # (a host whose forward failed stops participating; peers block at
        # the next lockstep allgather — recovery is restart-on-failure per
        # SURVEY §5.3, local callers never hang)
        out = self._local_rows(out_g)
        now = time.monotonic()
        with self._stats_lock:
            self._images += min(n, b_local)
            self._batches += 1
            self._occupancy += min(n, b_local) / b_local
            self._busy_s += now - t_run
            for _, _, t0 in batch[:b_local]:
                self._latencies.append(now - t0)
        for i, (_, fut, _) in enumerate(batch[:b_local]):
            fut.set_result(out[i])
        for item in batch[b_local:]:
            self._queue.put(item)

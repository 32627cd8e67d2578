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

from qtpu.parallel.mesh import batch_sharding, make_mesh, shard_variables


class ServingEngine:
    """Continuous-batching inference engine over a device mesh."""

    def __init__(self, model, serve_vars: Dict[str, Any], *,
                 mesh=None, batch_buckets: Sequence[int] = (1, 2, 4, 8, 16, 32),
                 max_wait_ms: float = 2.0, forward_fn=None,
                 max_queue: int = 4096):
        """``model``/``serve_vars``: a frozen SERVE module + variables.

        ``forward_fn(variables, batch) -> logits`` overrides the module apply —
        pass a flat engine's forward (e.g. ``lambda v, x:
        ResNetInt8Engine(v, arch)._forward(x)``) to serve through the fused
        int8-resident pipeline instead of the generic module path.
        """
        self.model = model
        self.mesh = mesh if mesh is not None else make_mesh(tp=1)
        self.vars = shard_variables(serve_vars, self.mesh)
        # batch buckets must shard over the 'data' axis: round each up to a
        # multiple of dp (padding fills the difference at dispatch time)
        dp = self.mesh.shape["data"]
        self.buckets = tuple(sorted({-(-b // dp) * dp for b in batch_buckets}))
        self.max_wait_s = max_wait_ms / 1e3
        self._x_sharding = batch_sharding(self.mesh)
        self._fwd = jax.jit(forward_fn if forward_fn is not None
                            else model.apply)
        # Bounded queue: submit() blocks once max_queue requests are pending
        # (backpressure instead of unbounded memory growth).
        self._queue: "queue.Queue[Optional[Tuple[np.ndarray, Future, float]]]" \
            = queue.Queue(maxsize=max_queue)
        self._stats_lock = threading.Lock()
        self._latencies: list = []
        self._images = 0
        self._batches = 0
        self._occupancy = 0.0
        self._busy_s = 0.0
        self._started = time.monotonic()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # ---- client API -----------------------------------------------------

    def submit(self, image: np.ndarray) -> Future:
        """Enqueue one image (H, W, C); resolves to its logits."""
        if self._stop.is_set():
            raise RuntimeError("ServingEngine is stopped")
        fut: Future = Future()
        self._queue.put((np.asarray(image), fut, time.monotonic()))
        return fut

    def predict(self, images: np.ndarray) -> np.ndarray:
        """Synchronous convenience: submit a batch, wait for all results."""
        futs = [self.submit(im) for im in images]
        return np.stack([f.result() for f in futs])

    def warmup(self, image_shape: Tuple[int, int, int]) -> None:
        """Compile every bucket ahead of time."""
        for b in self.buckets:
            x = jnp.zeros((b, *image_shape), jnp.float32)
            x = jax.device_put(x, self._x_sharding)
            jax.block_until_ready(self._fwd(self.vars, x))

    def stats(self) -> Dict[str, float]:
        with self._stats_lock:
            lat = sorted(self._latencies[-10_000:])
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
        self._thread.join(timeout=10)
        # Requests still queued (or raced past the _stop check in submit)
        # must not leave callers blocked on their futures forever.
        while True:
            try:
                item = self._queue.get_nowait()
            except queue.Empty:
                break
            if item is not None:
                item[1].set_exception(RuntimeError("ServingEngine stopped"))

    # ---- scheduler ------------------------------------------------------

    def _bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if b >= n:
                return b
        return self.buckets[-1]

    def _loop(self) -> None:
        max_b = self.buckets[-1]
        while not self._stop.is_set():
            try:
                first = self._queue.get(timeout=0.1)
            except queue.Empty:
                continue
            if first is None:
                return
            batch = [first]
            deadline = time.monotonic() + self.max_wait_s
            while len(batch) < max_b:
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
            self._run_batch(batch)

    def _run_batch(self, batch) -> None:
        n = len(batch)
        b = self._bucket_for(n)
        imgs = np.stack([item[0] for item in batch[:b]])
        if len(imgs) < b:
            pad = np.zeros((b - len(imgs), *imgs.shape[1:]), imgs.dtype)
            imgs = np.concatenate([imgs, pad])
        t_run = time.monotonic()
        x = jax.device_put(jnp.asarray(imgs), self._x_sharding)
        out = np.asarray(jax.block_until_ready(self._fwd(self.vars, x)))
        now = time.monotonic()
        with self._stats_lock:
            self._images += n
            self._batches += 1
            self._occupancy += n / b
            self._busy_s += now - t_run
            for _, _, t0 in batch[:b]:
                self._latencies.append(now - t0)
        for i, (_, fut, _) in enumerate(batch[:b]):
            fut.set_result(out[i])
        # overflow beyond the largest bucket: requeue (shouldn't happen since
        # the loop caps collection at max bucket size)
        for item in batch[b:]:
            self._queue.put(item)

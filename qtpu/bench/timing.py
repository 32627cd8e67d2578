"""Microbenchmark timing utilities for TPU kernels.

Measurement methodology (important on this environment): the axon tunnel adds
a fixed ~25 ms launch+fetch overhead per jitted program execution, so naive
per-call timing is garbage for sub-ms kernels.  ``time_scan_fit`` compiles the
op into a ``lax.scan`` chain at two lengths and returns the slope — the true
per-iteration device time — cancelling the fixed overhead.  The chained value
must feed the next iteration so XLA cannot elide or overlap iterations, and
the result must be fetched to host (``np.asarray``) because block_until_ready
alone does not await remote execution here.
"""
from __future__ import annotations

import time
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def time_scan_fit(body: Callable, init, *args, n_short: int = 50,
                  n_long: int = 200, reps: int = 3,
                  compiler_options: dict | None = None) -> float:
    """Per-iteration seconds of ``body(carry, *args) -> carry``.

    ``body`` must return a carry with the same structure/shape as ``init``.
    ``compiler_options`` applies per-program XLA backend options to the scan
    chain (must be a TOP-level jit option — scripts/chip_xla_options_sweep
    uses this for drift-free same-process flag A/Bs); ``body`` must then be
    unjitted so it traces inline.
    """

    def total(length: int) -> float:
        @partial(jax.jit, compiler_options=compiler_options)
        def chain(c0, *rest):
            def f(c, _):
                return body(c, *rest), ()
            c, _ = jax.lax.scan(f, c0, None, length=length)
            return jax.tree.map(
                lambda a: jnp.sum(a.astype(jnp.float32)), c)
        r = chain(init, *args)
        jax.tree.map(np.asarray, r)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            r = chain(init, *args)
            jax.tree.map(np.asarray, r)
            best = min(best, time.perf_counter() - t0)
        return best

    t_short = total(n_short)
    t_long = total(n_long)
    return max((t_long - t_short) / (n_long - n_short), 1e-9)


# TPU v5e (v5 lite) nominal peak rates, per chip.
V5E_BF16_FLOPS = 197e12
V5E_INT8_OPS = 394e12
V5E_HBM_GBPS = 819e9

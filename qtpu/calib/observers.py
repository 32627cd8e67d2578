"""Calibration observers: on-device, jit-safe statistics collectors.

TPU-native rebuild of the reference's calibration hooks (SURVEY.md §2.1 rows
"Calibration — naive min-max" / "Calibration — KL divergence"; reference collects
stats via Gluon forward-pre-hooks with a device→host sync per layer per batch,
SURVEY.md §3.2).  Here every observer is a pure function over a small pytree of
arrays that lives in a Flax mutable collection — updates stay on device inside the
jitted forward pass; only the one-off threshold *search* (see ``qtpu.calib.kl``)
runs on host after collection.

Observer state layout (all float32 unless noted):

* min-max:  ``{"min": (), "max": (), "count": () int32}``
* EMA:      same keys; exponential moving average with momentum
* histogram: ``{"counts": (nbins,), "amax": ()}`` — |x| histogram over a *frozen*
  range recorded by a preceding min-max pass (two-pass scheme; the reference's
  host-side numpy accumulation is the single-pass equivalent).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array
State = Dict[str, Array]

HIST_NBINS = 2048  # canonical TensorRT bin count (SURVEY.md §2.1 [B][K-high])


# ---------------------------------------------------------------------------
# Min-max (global) observer
# ---------------------------------------------------------------------------

def minmax_init() -> State:
    return {"min": jnp.zeros((), jnp.float32),
            "max": jnp.zeros((), jnp.float32),
            "count": jnp.zeros((), jnp.int32)}


def minmax_update(state: State, x: Array) -> State:
    """Global (all-batches) running min/max."""
    bmin = jnp.min(x).astype(jnp.float32)
    bmax = jnp.max(x).astype(jnp.float32)
    first = state["count"] == 0
    return {
        "min": jnp.where(first, bmin, jnp.minimum(state["min"], bmin)),
        "max": jnp.where(first, bmax, jnp.maximum(state["max"], bmax)),
        "count": state["count"] + 1,
    }


# ---------------------------------------------------------------------------
# EMA min-max observer (training-time online calibration)
# ---------------------------------------------------------------------------

def ema_init() -> State:
    return minmax_init()


def ema_update(state: State, x: Array, momentum: float = 0.99) -> State:
    """Exponential-moving-average min/max (reference's online QAT mode)."""
    bmin = jnp.min(x).astype(jnp.float32)
    bmax = jnp.max(x).astype(jnp.float32)
    first = state["count"] == 0
    m = jnp.float32(momentum)
    return {
        "min": jnp.where(first, bmin, m * state["min"] + (1 - m) * bmin),
        "max": jnp.where(first, bmax, m * state["max"] + (1 - m) * bmax),
        "count": state["count"] + 1,
    }


# ---------------------------------------------------------------------------
# Histogram observer (phase 2 of KL calibration)
# ---------------------------------------------------------------------------

def hist_init(nbins: int = HIST_NBINS) -> State:
    return {"counts": jnp.zeros((nbins,), jnp.float32),
            "amax": jnp.zeros((), jnp.float32)}


def hist_set_range(state: State, amax: Array) -> State:
    """Freeze the histogram range (call once, after the min-max pass)."""
    return {**state, "amax": jnp.asarray(amax, jnp.float32)}


def hist_update(state: State, x: Array) -> State:
    """Accumulate the |x| histogram over [0, amax] on device.

    Values above amax land in the last bin (they only exist if the range pass
    saw fewer batches than the histogram pass; clamping matches TensorRT's
    outlier handling).
    """
    nbins = state["counts"].shape[0]
    amax = jnp.maximum(state["amax"], 1e-12)
    ax = jnp.abs(x).astype(jnp.float32).reshape(-1)
    idx = jnp.clip((ax / amax * nbins).astype(jnp.int32), 0, nbins - 1)
    # Count the batch EXACTLY in int32 first, then accumulate as float32:
    # scattering +1.0 straight into a float32 total silently saturates a
    # bin at 2^24 (one ulp > 1), dropping mass on ImageNet-scale
    # calibration sets and skewing the KL threshold.  Batch subtotals
    # added to a large float32 running sum lose only ~2^-24 relative —
    # harmless for a distribution.
    bcounts = jnp.zeros((nbins,), jnp.int32).at[idx].add(1)
    counts = state["counts"] + bcounts.astype(jnp.float32)
    return {**state, "counts": counts}


# ---------------------------------------------------------------------------
# Finalization -> quantization params
# ---------------------------------------------------------------------------

def minmax_to_affine(state: State, bits: int = 8) -> Tuple[Array, Array]:
    from qtpu.ops import fakequant as fq
    return fq.affine_qparams(state["min"], state["max"], bits)


def minmax_to_symmetric(state: State, bits: int = 8) -> Array:
    from qtpu.ops import fakequant as fq
    amax = jnp.maximum(jnp.abs(state["min"]), jnp.abs(state["max"]))
    return fq.symmetric_scale(amax, bits)

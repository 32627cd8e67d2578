"""Debug-mode numeric assertions for the integer core (SURVEY.md §5.2).

The reference has no sanitizers of any kind (SURVEY §5.2: none [K-high]); for
the TPU build the risks are silent dtype/shape drift in the integer serving
path and corrupt frozen weights (NaN scales, out-of-grid codes).  This module
provides two tiers, both behind one toggle so production serving pays zero
cost:

* **Trace-time structure checks** (``check_int_inputs``) — chex dtype/shape
  assertions on the int8 kernel inputs.  These run during ``jit`` tracing
  only; they never appear in the compiled program.
* **Concrete value checks** (``check_frozen_node``) — run eagerly at freeze
  time on materialized arrays: finite positive scales, weight codes inside
  the int8/int4 grid, colsum consistency, int32 zero-points.

Toggle: ``QTPU_DEBUG=1`` in the environment, or ``debug.enable()`` in code
(tests use the latter).  Disabled, every check is a single ``if`` and returns.
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import chex
import jax
import jax.numpy as jnp
import numpy as np

_enabled = os.environ.get("QTPU_DEBUG", "").lower() in ("1", "true", "on")


def enable(on: bool = True) -> None:
    """Turn debug checks on/off process-wide (tests; overrides QTPU_DEBUG)."""
    global _enabled
    _enabled = bool(on)


def enabled() -> bool:
    return _enabled


def check_int_inputs(x_q: jax.Array, w_q: Optional[jax.Array] = None,
                     *, what: str = "qop") -> None:
    """Trace-time: integer-kernel inputs must be int8 (storage dtype).

    int4 is nibble-packed *inside* int8 storage, so int8 is the only legal
    wire dtype for both int8 and int4 paths.
    """
    if not _enabled:
        return
    try:
        chex.assert_type(x_q, jnp.int8)
        if w_q is not None:
            chex.assert_type(w_q, jnp.int8)
            chex.assert_rank(w_q, {2, 4})
    except AssertionError as e:
        raise AssertionError(f"{what}: {e}") from None


def check_quant_grid(scale: jax.Array, zp: Optional[jax.Array] = None,
                     *, what: str = "grid") -> None:
    """Trace-time: quantization grid params have the expected dtypes/ranks."""
    if not _enabled:
        return
    try:
        s = jnp.asarray(scale)
        chex.assert_rank(s, {0, 1})
        if zp is not None:
            z = jnp.asarray(zp)
            chex.assert_rank(z, {0, 1})
            if not jnp.issubdtype(z.dtype, jnp.integer) and \
                    not jnp.issubdtype(z.dtype, jnp.floating):
                raise AssertionError(f"zp dtype {z.dtype} is not numeric")
    except AssertionError as e:
        raise AssertionError(f"{what}: {e}") from None


def check_frozen_node(node: Dict[str, jax.Array], *, bits: int,
                      packed: bool, path: str = "") -> None:
    """Eager value checks on one frozen layer (freeze() output).

    Asserts: finite positive w_scale/act_scale, int8 storage, codes inside
    the ``bits`` grid (unpacked), colsum == sum of unpacked codes, act_zp on
    the signed int8 grid.  Runs on concrete arrays only — freeze() executes
    eagerly, so this is safe and exact.
    """
    if not _enabled:
        return
    where = f"frozen[{path}]"
    w_q = np.asarray(node["kernel_q"])
    if w_q.dtype != np.int8:
        raise AssertionError(f"{where}: kernel_q dtype {w_q.dtype} != int8")
    w_scale = np.asarray(node["w_scale"], np.float64)
    act_scale = np.asarray(node["act_scale"], np.float64)
    for name, s in (("w_scale", w_scale), ("act_scale", act_scale)):
        if not np.all(np.isfinite(s)):
            raise AssertionError(f"{where}: {name} has non-finite entries")
        if not np.all(s > 0):
            raise AssertionError(f"{where}: {name} has non-positive entries")
    if not np.all(np.isfinite(np.asarray(node["bias"], np.float64))):
        raise AssertionError(f"{where}: bias has non-finite entries")
    zp = np.asarray(node["act_zp"])
    if zp.dtype != np.int32:
        raise AssertionError(f"{where}: act_zp dtype {zp.dtype} != int32")
    if not (-128 <= int(zp) <= 127):
        raise AssertionError(f"{where}: act_zp {int(zp)} off the signed grid")
    if packed:
        from qtpu.ops import fakequant as fq
        w_codes = np.asarray(fq.unpack_int4(jnp.asarray(w_q), axis=-1))
    else:
        w_codes = w_q
    qmax = (1 << (bits - 1)) - 1
    if w_codes.min() < -qmax or w_codes.max() > qmax:
        raise AssertionError(
            f"{where}: weight codes [{w_codes.min()}, {w_codes.max()}] "
            f"outside the symmetric int{bits} grid ±{qmax}")
    colsum = np.asarray(node["colsum"], np.int64)
    ref = w_codes.astype(np.int64).reshape(-1, w_codes.shape[-1]).sum(0)
    if not np.array_equal(colsum, ref):
        raise AssertionError(f"{where}: colsum disagrees with kernel codes")

"""Fake-quantization primitives (clip / round / scale) with STE gradients.

This is the numerical core of the framework — the TPU-native rebuild of the
reference's weight/input fake-quant hooks (Quantization.MXNet `quantize/convert.py`;
reference mount was empty this session, see SURVEY.md §0 — behavior reconstructed
from SURVEY.md §2.1 [K-med/K-high] and BASELINE.json north star [B]):

* uniform quantization, INT8 and INT4 grids;
* **symmetric** (scale only, restricted range ``[-(2^(b-1)-1), 2^(b-1)-1]``,
  the ``max|w| / 127`` scheme) — used for weights and for KL-calibrated
  activations;
* **affine** (scale + zero-point, full range) — used for min-max calibrated
  activations;
* per-tensor ("layer-wise") and per-channel ("channel-wise") scales;
* straight-through-estimator gradients, either pure pass-through
  (``x + stop_gradient(q(x) - x)``, the reference's hook behavior [B]) or
  clip-masked (gradient zero outside the representable range).

Everything here is pure JAX: shape-static, jit-friendly, fusable by XLA.  The
Pallas kernels in ``qtpu.ops.pallas`` consume the same scale/zero-point
conventions, so fake-quant simulation and real int8/int4 execution agree bit-for-bit
on the quantized grid.
"""
from __future__ import annotations

from typing import Literal, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

STE = Literal["passthrough", "clip"]


# ---------------------------------------------------------------------------
# Quantization grids


# ---------------------------------------------------------------------------


def qrange(bits: int, signed: bool = True, symmetric: bool = True) -> Tuple[int, int]:
    """Integer range of a ``bits``-wide grid.

    Symmetric signed grids use the *restricted* range ``[-(2^(b-1)-1), 2^(b-1)-1]``
    (e.g. [-127, 127] for int8), matching the reference's ``max|w|/(2^(b-1)-1)``
    scale (SURVEY.md §2.1 weight fake-quant row).  Affine grids use the full
    two's-complement range.
    """
    if signed:
        qmax = (1 << (bits - 1)) - 1
        qmin = -qmax if symmetric else -(1 << (bits - 1))
    else:
        qmin, qmax = 0, (1 << bits) - 1
    return qmin, qmax


def symmetric_scale(amax: Array, bits: int) -> Array:
    """Scale for a symmetric grid from an absolute-max (or KL threshold) value."""
    _, qmax = qrange(bits, signed=True, symmetric=True)
    amax = jnp.asarray(amax, jnp.float32)
    return jnp.maximum(amax, 1e-12) / qmax


def affine_qparams(xmin: Array, xmax: Array, bits: int,
                   signed: bool = False) -> Tuple[Array, Array]:
    """Affine (scale, zero_point) covering ``[xmin, xmax]``.

    The range is first widened to include 0 so that zero is exactly
    representable (required so padding/ReLU zeros survive quantization).
    ``zero_point`` is returned as float already rounded to an integer value.
    """
    qmin, qmax = qrange(bits, signed=signed, symmetric=False)
    xmin = jnp.minimum(jnp.asarray(xmin, jnp.float32), 0.0)
    xmax = jnp.maximum(jnp.asarray(xmax, jnp.float32), 0.0)
    scale = jnp.maximum((xmax - xmin) / (qmax - qmin), 1e-12)
    zp = jnp.clip(jnp.round(qmin - xmin / scale), qmin, qmax)
    return scale, zp


def channel_amax(x: Array, channel_axis: int) -> Array:
    """Per-channel absolute max, keepdims so the result broadcasts against x."""
    axes = tuple(i for i in range(x.ndim) if i != channel_axis % x.ndim)
    return jnp.max(jnp.abs(x), axis=axes, keepdims=True)


# ---------------------------------------------------------------------------
# Fake quantization (quantize -> dequantize in fp) with STE


# ---------------------------------------------------------------------------


def _quantize_to_grid(x: Array, scale: Array, zero_point: Array,
                      qmin: int, qmax: int) -> Array:
    """Clip/round/scale onto the integer grid, returned still in float."""
    q = jnp.round(x / scale + zero_point)
    return jnp.clip(q, qmin, qmax)


def fake_quant(x: Array, scale: Array, zero_point: Array | float = 0.0, *,
               bits: int = 8, signed: bool = True, symmetric: bool = True,
               ste: STE = "passthrough") -> Array:
    """Simulated quantization: ``dequantize(quantize(x))`` with STE gradient.

    ``scale``/``zero_point`` must broadcast against ``x`` (per-tensor scalars or
    per-channel keepdims arrays).  Gradients do not flow into scale/zero_point
    (the reference recomputes scales outside autograd; SURVEY.md §3.3).

    ste="passthrough": d/dx = 1 everywhere (reference hook behavior [B]).
    ste="clip":        d/dx = 1 inside the representable range, 0 outside.
    """
    qmin, qmax = qrange(bits, signed=signed, symmetric=symmetric)
    scale = jax.lax.stop_gradient(jnp.asarray(scale, x.dtype))
    zero_point = jax.lax.stop_gradient(jnp.asarray(zero_point, x.dtype))
    q = _quantize_to_grid(x, scale, zero_point, qmin, qmax)
    xq = (q - zero_point) * scale
    if ste == "passthrough":
        return x + jax.lax.stop_gradient(xq - x)
    # clip STE: identity gradient only where x lands strictly inside the grid.
    t = x / scale + zero_point
    inside = jnp.logical_and(t >= qmin, t <= qmax)
    return jnp.where(inside, x + jax.lax.stop_gradient(xq - x),
                     jax.lax.stop_gradient(xq))


def fake_quant_pact(x: Array, alpha: Array, *, bits: int = 8,
                    ste: STE = "passthrough") -> Array:
    """PACT activation fake-quant with a LEARNABLE clip threshold.

    Choi et al. 2018 (PAPERS.md): ``y = clip(x, 0, α)`` quantized on the
    unsigned grid ``[0, α]``.  The α gradient is exactly the paper's STE —
    ``∂y/∂α = 1{x ≥ α}`` — obtained for free from ``jnp.clip``'s autodiff;
    the gradient through the grid scale is stopped (as for all scales here,
    SURVEY.md §3.3).  The resulting grid equals ``affine_qparams(0, α)``
    with zero_point 0, so calibration/freeze/serving treat PACT layers like
    any affine activation (ActQuant records (0, α) as the observed range).
    """
    _, qmax = qrange(bits, signed=False, symmetric=False)
    alpha = jnp.maximum(jnp.asarray(alpha, jnp.float32), 1e-6)
    yc = jnp.clip(x, 0.0, alpha)
    scale = jax.lax.stop_gradient(alpha) / qmax
    return fake_quant(yc, scale, 0.0, bits=bits, signed=False,
                      symmetric=False, ste=ste)


def fake_quant_weight(w: Array, *, bits: int = 8,
                      channel_axis: Optional[int] = None,
                      ste: STE = "passthrough") -> Array:
    """Weight fake-quant with the scale recomputed from the live fp32 weights.

    Per-tensor (``channel_axis=None``) or per-channel symmetric.  This mirrors the
    reference's weight pre-hook: every forward, scale = max|W|/(2^(b-1)-1), then
    clip/round/scale (SURVEY.md §2.1).  During QAT the scale tracks the master
    weights step to step.
    """
    if channel_axis is None:
        amax = jnp.max(jnp.abs(w))
    else:
        amax = channel_amax(w, channel_axis)
    scale = symmetric_scale(jax.lax.stop_gradient(amax), bits)
    return fake_quant(w, scale, 0.0, bits=bits, signed=True, symmetric=True,
                      ste=ste)


def weight_qparams(w: Array, *, bits: int = 8,
                   channel_axis: Optional[int] = None) -> Array:
    """The symmetric scale that :func:`fake_quant_weight` would use (for export)."""
    if channel_axis is None:
        amax = jnp.max(jnp.abs(w))
    else:
        amax = channel_amax(w, channel_axis)
    return symmetric_scale(amax, bits)


# ---------------------------------------------------------------------------
# Real quantization (for serving: materialize integer tensors)


# ---------------------------------------------------------------------------


def quantize(x: Array, scale: Array, zero_point: Array | float = 0.0, *,
             bits: int = 8, signed: bool = True, symmetric: bool = True) -> Array:
    """Quantize to an actual integer array (int8 storage for both int8/int4)."""
    qmin, qmax = qrange(bits, signed=signed, symmetric=symmetric)
    q = _quantize_to_grid(jnp.asarray(x, jnp.float32), jnp.asarray(scale, jnp.float32),
                          jnp.asarray(zero_point, jnp.float32), qmin, qmax)
    return q.astype(jnp.int8 if signed else jnp.uint8)


def dequantize(q: Array, scale: Array, zero_point: Array | float = 0.0) -> Array:
    return (q.astype(jnp.float32) - zero_point) * scale


# ---------------------------------------------------------------------------
# INT4 packing: two int4 values per int8 byte (serving weight format)


# ---------------------------------------------------------------------------


def pack_int4(q: Array, axis: int = -1) -> Array:
    """Pack an int8 array holding int4 values ([-7,7]) into nibbles along ``axis``.

    The axis length must be even.  Low nibble = even index, high nibble = odd.
    """
    axis = axis % q.ndim
    n = q.shape[axis]
    if n % 2:
        raise ValueError(f"pack axis length must be even, got {n}")
    lo = jax.lax.slice_in_dim(q, 0, n, stride=2, axis=axis)
    hi = jax.lax.slice_in_dim(q, 1, n, stride=2, axis=axis)
    return ((lo & 0x0F) | (hi << 4)).astype(jnp.int8)


def unpack_int4(packed: Array, axis: int = -1) -> Array:
    """Inverse of :func:`pack_int4`: int8 nibbles -> int8 array of int4 values."""
    axis = axis % packed.ndim
    lo = (packed << 4).astype(jnp.int8) >> 4       # sign-extend low nibble
    hi = packed >> 4                                # arithmetic shift: high nibble
    stacked = jnp.stack([lo, hi], axis=axis + 1)   # interleave back
    shape = list(packed.shape)
    shape[axis] = shape[axis] * 2
    return stacked.reshape(shape)

"""Integer execution ops for the serving path (XLA int8 → MXU).

These are the *real* quantized compute primitives used by ``QuantMode.SERVE``:
int8×int8→int32 matmul/conv with the dequantization epilogue fused by XLA.
On TPU, int8 contractions with ``preferred_element_type=jnp.int32`` lower onto
the MXU int8 path (2× the bf16 rate on v5e).  The Pallas kernels in
``qtpu.ops.pallas`` implement the same contracts with hand-tiled fusion; this
module is both the portable fallback and the numerical oracle the Pallas
kernels are tested against (SURVEY.md §4.2).

Affine-activation correctness notes (the classic integer-conv pitfalls):

* zero-point padding: a real 0 maps to ``q = zp``, so SAME conv padding must
  pad the integer tensor with ``zp``, not 0 — handled by explicit lax.pad.
* epilogue: y = s_x·s_w·(acc − zp_x·colsum(w)) + b, where colsum is the
  per-output-channel sum of integer weights (precomputed at freeze time).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from qtpu.utils import debug

Array = jax.Array


def same_pads(in_spatial: Sequence[int], window: Sequence[int],
              strides: Sequence[int]) -> Tuple[Tuple[int, int], ...]:
    """Explicit (lo, hi) pads reproducing XLA SAME padding."""
    pads = []
    for n, w, s in zip(in_spatial, window, strides):
        out = -(-n // s)
        total = max((out - 1) * s + w - n, 0)
        pads.append((total // 2, total - total // 2))
    return tuple(pads)


def qconv2d(x_q: Array, w_q: Array, *, strides: Tuple[int, int] = (1, 1),
            padding: Union[str, Sequence[Tuple[int, int]]] = "SAME",
            groups: int = 1, zp: Optional[Array] = None) -> Array:
    """int8 NHWC × int8 HWIO → int32 NHWC convolution.

    ``zp`` (integer-valued scalar) is the activation zero-point used for
    padding; pass None for symmetric activations (pad with 0).
    """
    debug.check_int_inputs(x_q, w_q, what="qconv2d")
    if isinstance(padding, str) and padding.upper() == "SAME":
        pads = same_pads(x_q.shape[1:3], w_q.shape[:2], strides)
    elif isinstance(padding, str):
        pads = ((0, 0), (0, 0))
    else:
        pads = tuple(padding)
    if any(p != (0, 0) for p in pads):
        pad_val = (jnp.zeros((), x_q.dtype) if zp is None
                   else zp.astype(x_q.dtype))
        x_q = jax.lax.pad(x_q, pad_val,
                          ((0, 0, 0), (*pads[0], 0), (*pads[1], 0), (0, 0, 0)))
    return jax.lax.conv_general_dilated(
        x_q, w_q, window_strides=strides, padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.int32)


def qmatmul(x_q: Array, w_q: Array) -> Array:
    """int8 (…, K) × int8 (K, N) → int32 (…, N)."""
    debug.check_int_inputs(x_q, w_q, what="qmatmul")
    return jax.lax.dot_general(
        x_q, w_q, dimension_numbers=(((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


def quantize_act(x: Array, scale: Array, zp: Array, bits: int = 8,
                 symmetric: bool = False) -> Array:
    """fp32 → signed int8 storage on an affine grid with zero-point ``zp``.

    ``zp`` (int32 scalar) is on the signed grid (freeze shifts the unsigned
    calibration zero-point by −2^(bits−1)).  To bit-match the fake-quant
    simulation, the affine path rounds on the *unsigned* grid exactly as
    ``fakequant.fake_quant`` does — ``round(x/s + zp_u)`` — then shifts:
    fp32 rounding of ``x/s + 5`` vs ``x/s + 133`` can differ by one code at
    tie boundaries, which would otherwise make integer serving diverge from
    the calibrated simulation.
    """
    debug.check_quant_grid(scale, zp, what="quantize_act")
    qmax = (1 << (bits - 1)) - 1
    if symmetric:
        q = jnp.clip(jnp.round(x / scale), -qmax, qmax)
    else:
        offset = 1 << (bits - 1)
        zp_u = zp.astype(jnp.float32) + offset
        q = jnp.clip(jnp.round(x / scale + zp_u), 0, (1 << bits) - 1) - offset
    return q.astype(jnp.int8)


def dequant_epilogue(acc: Array, *, act_scale: Array, act_zp: Array,
                     w_scale: Array, colsum: Array,
                     bias: Optional[Array] = None) -> Array:
    """(acc int32, scales) → fp32 output.

    y[..., o] = act_scale·w_scale[o]·(acc[..., o] − act_zp·colsum[o]) + b[o]

    ``act_zp`` and ``colsum`` are int32 so the zero-point correction happens
    exactly in integer arithmetic before the float conversion.
    """
    corrected = acc - act_zp * colsum
    y = corrected.astype(jnp.float32) * (act_scale * w_scale)
    if bias is not None:
        y = y + bias
    return y

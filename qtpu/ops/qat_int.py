"""Integer-forward QAT: run the fake-quant sim conv on the int8 MXU path.

The standard QAT simulation (reference behavior, SURVEY.md §3.3 — mount empty,
§0) computes ``conv(fake_quant(x), fake_quant_weight(w))`` in fp32: every
operand is a dequantized grid point, so the conv itself is exactly an integer
convolution scaled by ``act_scale · w_scale``.  On TPU that identity is worth
money: the int8 MXU path runs at 2x the bf16 rate, and saving int8 *codes*
instead of fp32 activations for the backward pass quarters the residual
memory/HBM traffic between forward and backward.

``qat_int_conv`` exploits it with a ``jax.custom_vjp``:

* **forward** — quantize x and w to int8 codes (bit-identical grids to
  ``qtpu.ops.fakequant``), integer conv (``qops.qconv2d``), dequantize with
  the zero-point colsum correction.  Mathematically equal to the fp32 sim
  (differs only by fp32 accumulation error, which the integer path does not
  have — the int32 accumulator is exact).
* **backward** — the passthrough-STE gradients of the sim path, computed from
  the saved int8 codes: dL/dx = convᵀ(g, dequant(w_codes)),
  dL/dw = wgrad(dequant(x_codes), g), via ``jax.linear_transpose`` so no
  primal is re-evaluated.  Scales/zero-points get zero gradients (the
  reference recomputes scales outside autograd, SURVEY.md §3.3).

Supported: passthrough STE, affine or symmetric activations, per-channel or
per-tensor weights, int8/int4 weight grids, grouped/depthwise convs.  Layers
fall back to the fp32 sim for clip-STE or PACT specs (those need gradient
masks / a live α that the int path does not carry).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from qtpu.ops import fakequant as fq
from qtpu.ops import qops

Array = jax.Array

_SIGNED_OFFSET = 128  # int8 storage shift for unsigned affine codes


def _quantize_weight_codes(w: Array, bits: int, channel_axis: Optional[int]
                           ) -> Tuple[Array, Array]:
    """(codes int8, scale f32 broadcastable) matching fake_quant_weight."""
    if channel_axis is None:
        amax = jnp.max(jnp.abs(w))
    else:
        amax = fq.channel_amax(w, channel_axis)
    scale = fq.symmetric_scale(jax.lax.stop_gradient(amax), bits)
    _, qmax = fq.qrange(bits, signed=True, symmetric=True)
    codes = jnp.clip(jnp.round(w / scale), -qmax, qmax).astype(jnp.int8)
    return codes, scale


def _quantize_act_codes(x: Array, scale: Array, zp_u: Array, bits: int,
                        symmetric: bool) -> Array:
    """int8 codes on the fake-quant grid (affine codes stored signed-shifted)."""
    _, qmax = fq.qrange(bits, signed=True, symmetric=True)
    if symmetric:
        q = jnp.clip(jnp.round(x / scale), -qmax, qmax)
        return q.astype(jnp.int8)
    q = jnp.clip(jnp.round(x / scale + zp_u), 0, (1 << bits) - 1)
    return (q - _SIGNED_OFFSET).astype(jnp.int8)


def _dequant_act_codes(x_s: Array, scale: Array, zp_u: Array,
                       symmetric: bool) -> Array:
    if symmetric:
        return x_s.astype(jnp.float32) * scale
    return (x_s.astype(jnp.float32) + (_SIGNED_OFFSET - zp_u)) * scale


def _conv_f32(x: Array, w: Array, strides, padding, groups) -> Array:
    return jax.lax.conv_general_dilated(
        x, w, window_strides=strides, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups, preferred_element_type=jnp.float32)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10))
def _qat_int_conv(x, w, act_scale, act_zp_u, a_bits, w_bits, per_channel,
                  act_symmetric, strides, padding, groups):
    y, _ = _fwd(x, w, act_scale, act_zp_u, a_bits, w_bits, per_channel,
                act_symmetric, strides, padding, groups)
    return y


def _fwd(x, w, act_scale, act_zp_u, a_bits, w_bits, per_channel,
         act_symmetric, strides, padding, groups):
    act_scale = jax.lax.stop_gradient(jnp.asarray(act_scale, jnp.float32))
    act_zp_u = jax.lax.stop_gradient(jnp.asarray(act_zp_u, jnp.float32))
    w_codes, w_scale = _quantize_weight_codes(
        w, w_bits, channel_axis=3 if per_channel else None)
    x_codes = _quantize_act_codes(x, act_scale, act_zp_u, a_bits,
                                  act_symmetric)
    if act_symmetric:
        pad_zp = None
    else:
        pad_zp = (jnp.round(act_zp_u) - _SIGNED_OFFSET).astype(jnp.int32)
    acc = qops.qconv2d(x_codes, w_codes, strides=strides, padding=padding,
                       groups=groups, zp=pad_zp)
    # per-output-channel weight scale broadcasts on the NHWC minor dim
    w_scale_o = w_scale.reshape(-1) if per_channel else w_scale
    if act_symmetric:
        y = acc.astype(jnp.float32) * (act_scale * w_scale_o)
    else:
        # sim value: act_scale·w_scale · Σ (q_u − zp_u)·q_w
        #          = act_scale·w_scale · (acc + (128 − zp_u)·colsum(q_w)).
        # For grouped convs each output channel's kernel slice is exactly the
        # taps it sees, so the (0,1,2) colsum is already per-group-correct.
        colsum = jnp.sum(w_codes.astype(jnp.int32), axis=(0, 1, 2))
        y = (acc.astype(jnp.float32)
             + (_SIGNED_OFFSET - act_zp_u) * colsum) * (act_scale * w_scale_o)
    residuals = (x_codes, w_codes, act_scale, act_zp_u, w_scale,
                 x.shape, w.shape)
    return y, residuals


def _bwd(a_bits, w_bits, per_channel, act_symmetric, strides, padding, groups,
         residuals, g):
    x_codes, w_codes, act_scale, act_zp_u, w_scale, x_shape, w_shape = residuals
    x_deq = _dequant_act_codes(x_codes, act_scale, act_zp_u, act_symmetric)
    w_deq = w_codes.astype(jnp.float32) * w_scale
    conv_x = jax.linear_transpose(
        lambda xx: _conv_f32(xx, w_deq, strides, padding, groups),
        jax.ShapeDtypeStruct(x_shape, jnp.float32))
    conv_w = jax.linear_transpose(
        lambda ww: _conv_f32(x_deq, ww, strides, padding, groups),
        jax.ShapeDtypeStruct(w_shape, jnp.float32))
    (dx,) = conv_x(g)
    (dw,) = conv_w(g)
    return dx, dw, jnp.zeros_like(act_scale), jnp.zeros_like(act_zp_u)


_qat_int_conv.defvjp(_fwd, _bwd)


def qat_int_conv(x: Array, w: Array, act_scale: Array, act_zp_u: Array, *,
                 a_bits: int = 8, w_bits: int = 8, per_channel: bool = True,
                 act_symmetric: bool = False,
                 strides: Tuple[int, int] = (1, 1),
                 padding: Union[str, Sequence[Tuple[int, int]]] = "SAME",
                 groups: int = 1) -> Array:
    """``conv(fake_quant(x), fake_quant_weight(w))`` on the int8 MXU path.

    ``act_zp_u`` is the zero-point on the *unsigned* grid (as produced by
    ``fakequant.affine_qparams``); ignored for symmetric activations.
    Gradients: passthrough STE into ``x`` and ``w``; zero into the grid.
    """
    return _qat_int_conv(x, w, act_scale, act_zp_u, a_bits, w_bits,
                         per_channel, act_symmetric, tuple(strides), padding
                         if isinstance(padding, str) else tuple(padding),
                         groups)


def int_forward_ok(spec, mode) -> bool:
    """Whether a layer spec/mode pair can use the integer-forward path."""
    return (spec is not None and mode is not None and mode.quantizes
            and spec.ste == "passthrough" and spec.act_observer != "pact"
            and spec.quantize_weights and spec.quantize_acts)

"""Pallas TPU kernel: fused int8 quantized 2-D convolution (implicit GEMM).

The fused quantize→conv→dequantize kernel demanded by the north star [B]
(SURVEY.md §2.2 row 1; mount empty, §0 — designed from pallas_guide.md, no
reference native code exists).  XLA's own int8 conv path measures well below
its int8 matmul path on early ResNet layers (5-28% of peak vs 88%), so convs
are recast as MXU matmuls inside one kernel:

* input images are laid out (B, Hp, Wp·Ci) — 3-D; the (kh, kw) window shift
  becomes a *static* row slice plus a *static* kw·Ci lane offset.  (This
  Mosaic build rejects dynamic sublane-dim slices, so all KH·KW taps are
  unrolled in one grid step rather than iterated via the grid.)
* the (zp-pre-padded) int8 image block is fetched to VMEM once per batch
  tile; all KH·KW taps run (bb·OH·OW, Ci)×(Ci, Co) int32 MXU GEMMs against
  it, accumulating in registers/VMEM;
* the epilogue applies the exact integer zero-point correction, per-channel
  dequant, bias, and optionally fused requantization to int8 — activations
  then never leave int8 between layers.

Stride-2 convs are decomposed at the caller into phase-split stride-1 convs
(:func:`qconv2d_strided` in qtpu.ops.pallas.qconv_dispatch), reusing this
kernel.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _kernel(scal_ref, x_ref, w_ref, a_ref, b_ref,
            out_ref, *, KH: int, KW: int, OH: int, OW: int, Ci: int,
            requant: bool, shift: float, relu: bool,
            act_max: bool, raw_acc: bool = False):
    bb = x_ref.shape[0]
    acc = jnp.zeros((bb * OH * OW, a_ref.shape[1]), jnp.int32)
    for kh in range(KH):
        for kw in range(KW):
            window = x_ref[:, kh:kh + OH, kw * Ci:(kw + OW) * Ci]
            lhs = window.reshape(bb * OH * OW, Ci)
            acc = acc + jax.lax.dot_general(
                lhs, w_ref[kh * KW + kw], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
    co = a_ref.shape[1]
    if raw_acc:
        # phase-split strided convs (qconv_dispatch) sum several phases'
        # accumulators before ONE shared epilogue — emit the int32 acc.
        out_ref[:] = acc.reshape(bb, OH, OW * co)
        return
    # folded epilogue (qops.epilogue_coeffs — single source of truth,
    # bit-identical to the XLA path in qtpu.serve.fused_ops)
    t = acc.astype(jnp.float32) * a_ref[:] + b_ref[:]
    if requant:
        t = jnp.clip(jnp.round(t), scal_ref[0, 0], scal_ref[0, 1]) - shift
    else:
        if relu:
            t = jnp.maximum(t, 0.0)
        if act_max:
            t = jnp.minimum(t, scal_ref[0, 1])
    out_ref[:] = t.reshape(bb, OH, OW * co).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bb", "out_dtype", "interpret", "relu", "act_max", "raw_acc"))
def qconv2d_fused(x_q: Array, w_q: Array, *, act_scale: Array, act_zp: Array,
                  w_scale: Array, colsum: Array, bias: Optional[Array] = None,
                  requant_scale: Optional[Array] = None,
                  requant_zp: Optional[Array] = None, bb: int = 4,
                  out_dtype=jnp.float32, interpret: bool = False,
                  relu: bool = False,
                  act_max: Optional[float] = None,
                  raw_acc: bool = False) -> Array:
    """Stride-1 VALID int8 conv: (B,Hp,Wp,Ci) × (KH,KW,Ci,Co) → (B,OH,OW,Co).

    For SAME semantics, zero-point-pad first via :func:`pad_for_conv`.
    B % bb == 0.  ``colsum[o] = Σ w_q[...,o]`` (int32); scalar conventions as
    in ``qmatmul_fused``.
    """
    B, Hp, Wp, Ci = x_q.shape
    KH, KW, Ci2, Co = w_q.shape
    assert Ci == Ci2, (x_q.shape, w_q.shape)
    OH, OW = Hp - KH + 1, Wp - KW + 1
    bb = min(bb, B)
    assert B % bb == 0, (B, bb)
    # fold the epilogue ONCE (shared helper => bit-identical to the XLA path)
    from qtpu.ops import qops
    co, mode = qops.epilogue_coeffs(
        act_scale=act_scale, act_zp=act_zp, w_scale=w_scale, colsum=colsum,
        bias=bias, requant_scale=requant_scale, requant_zp=requant_zp,
        relu=relu, act_max=act_max)
    hi = (co.hi if mode.requant
          else jnp.float32(act_max if act_max is not None else 0.0))
    scal = jnp.stack([jnp.asarray(co.lo, jnp.float32).reshape(()),
                      jnp.asarray(hi, jnp.float32).reshape(())]).reshape(1, 2)
    a_row = co.A.reshape(1, Co)
    b_row = co.B.reshape(1, Co)
    x3 = x_q.reshape(B, Hp, Wp * Ci)
    w_r = w_q.reshape(KH * KW, Ci, Co)

    grid = (B // bb,)
    kern = functools.partial(_kernel, KH=KH, KW=KW, OH=OH, OW=OW, Ci=Ci,
                             requant=mode.requant, shift=mode.shift,
                             relu=relu,
                             act_max=act_max is not None, raw_acc=raw_acc)
    if raw_acc:
        out_dtype = jnp.int32
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((bb, Hp, Wp * Ci), lambda i: (i, 0, 0)),
            pl.BlockSpec((KH * KW, Ci, Co), lambda i: (0, 0, 0)),
            pl.BlockSpec((1, Co), lambda i: (0, 0)),
            pl.BlockSpec((1, Co), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bb, OH, OW * Co), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, OH, OW * Co), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * OH * OW * Ci * Co * KH * KW,
            bytes_accessed=B * Hp * Wp * Ci + KH * KW * Ci * Co
            + B * OH * OW * Co,
            transcendentals=0),
        interpret=interpret,
    )(scal, x3, w_r, a_row, b_row)
    return out.reshape(B, OH, OW, Co)


def pad_for_conv(x_q: Array, kernel_hw: Tuple[int, int],
                 act_zp: Array) -> Array:
    """Zero-point padding for SAME stride-1 conv (see qops zero-point note).

    Uses the XLA SAME split (lo = total//2, hi = total − lo) so even kernel
    sizes pad asymmetrically like ``qops.qconv2d`` — symmetric k//2 padding
    would shift even-kernel outputs by one pixel vs the oracle.
    """
    from qtpu.ops.qops import same_pads

    pads = same_pads(x_q.shape[1:3], kernel_hw, (1, 1))
    if all(p == (0, 0) for p in pads):
        return x_q
    return jax.lax.pad(
        x_q, jnp.asarray(act_zp, x_q.dtype),
        ((0, 0, 0), (*pads[0], 0), (*pads[1], 0), (0, 0, 0)))

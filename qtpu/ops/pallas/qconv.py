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


def _kernel(scal_ref, zp_ref, x_ref, w_ref, ws_ref, cs_ref, b_ref,
            out_ref, *, KH: int, KW: int, OH: int, OW: int, Ci: int,
            requant: bool, requant_affine: bool, relu: bool,
            act_max: bool):
    bb = x_ref.shape[0]
    acc = jnp.zeros((bb * OH * OW, ws_ref.shape[1]), jnp.int32)
    for kh in range(KH):
        for kw in range(KW):
            window = x_ref[:, kh:kh + OH, kw * Ci:(kw + OW) * Ci]
            lhs = window.reshape(bb * OH * OW, Ci)
            acc = acc + jax.lax.dot_general(
                lhs, w_ref[kh * KW + kw], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
    act_scale = scal_ref[0, 0]
    zp = zp_ref[0, 0]
    corrected = acc - zp * cs_ref[:]
    y = corrected.astype(jnp.float32) * (act_scale * ws_ref[:]) + b_ref[:]
    if relu:
        y = jnp.maximum(y, 0.0)
    if act_max:
        y = jnp.minimum(y, scal_ref[0, 3])       # relu6-style upper clip
    if requant:
        # affine/symmetric requant; see qmatmul epilogue comment
        if requant_affine:
            q = jnp.round(y / scal_ref[0, 1] + scal_ref[0, 2])
            y = jnp.clip(q, 0.0, 255.0) - 128.0
        else:
            y = jnp.clip(jnp.round(y / scal_ref[0, 1]), -127.0, 127.0)
    co = ws_ref.shape[1]
    out_ref[:] = y.reshape(bb, OH, OW * co).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bb", "out_dtype", "interpret", "relu", "act_max"))
def qconv2d_fused(x_q: Array, w_q: Array, *, act_scale: Array, act_zp: Array,
                  w_scale: Array, colsum: Array, bias: Optional[Array] = None,
                  requant_scale: Optional[Array] = None,
                  requant_zp: Optional[Array] = None, bb: int = 4,
                  out_dtype=jnp.float32, interpret: bool = False,
                  relu: bool = False,
                  act_max: Optional[float] = None) -> Array:
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
    if bias is None:
        bias = jnp.zeros((Co,), jnp.float32)
    requant = requant_scale is not None
    rq_scale = (jnp.maximum(jnp.asarray(requant_scale, jnp.float32), 1e-12)
                if requant else jnp.ones((), jnp.float32))
    if requant_zp is None:   # symmetric requant grid (zp slot unused)
        rzp = jnp.float32(0.0)
        rlo = jnp.float32(0.0)
    else:                    # affine: zp is the signed-grid int zero point
        rzp = jnp.asarray(requant_zp, jnp.float32) + 128.0
        rlo = jnp.float32(0.0)
    if act_max is not None:
        rlo = jnp.float32(act_max)   # slot 3 reused for the upper clip
    scal = jnp.stack([jnp.asarray(act_scale, jnp.float32).reshape(()),
                      rq_scale.reshape(()), rzp.reshape(()),
                      rlo.reshape(())]).reshape(1, 4)
    zp = jnp.asarray(act_zp, jnp.int32).reshape(1, 1)
    ws = jnp.asarray(w_scale, jnp.float32).reshape(1, Co)
    cs = jnp.asarray(colsum, jnp.int32).reshape(1, Co)
    b = jnp.asarray(bias, jnp.float32).reshape(1, Co)
    x3 = x_q.reshape(B, Hp, Wp * Ci)
    w_r = w_q.reshape(KH * KW, Ci, Co)

    grid = (B // bb,)
    kern = functools.partial(_kernel, KH=KH, KW=KW, OH=OH, OW=OW, Ci=Ci,
                             requant=requant,
                             requant_affine=requant_zp is not None, relu=relu,
                             act_max=act_max is not None)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((bb, Hp, Wp * Ci), lambda i: (i, 0, 0)),
            pl.BlockSpec((KH * KW, Ci, Co), lambda i: (0, 0, 0)),
            pl.BlockSpec((1, Co), lambda i: (0, 0)),
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
    )(scal, zp, x3, w_r, ws, cs, b)
    return out.reshape(B, OH, OW, Co)


def pad_for_conv(x_q: Array, kernel_hw: Tuple[int, int],
                 act_zp: Array) -> Array:
    """Zero-point padding for SAME stride-1 conv (see qops zero-point note)."""
    ph, pw = kernel_hw[0] // 2, kernel_hw[1] // 2
    if ph == 0 and pw == 0:
        return x_q
    return jax.lax.pad(
        x_q, jnp.asarray(act_zp, x_q.dtype),
        ((0, 0, 0), (ph, ph, 0), (pw, pw, 0), (0, 0, 0)))

"""Pallas TPU kernel: fused int8 depthwise convolution (VPU).

The depthwise quant path (MobileNet, BASELINE.json config 3; SURVEY.md §2.2
"Depthwise-conv int8 kernel" — MXU-hostile per §7.2, so this is a VPU kernel).
Same layout trick as qconv: images live as (B, Hp, Wp·C) so every (kh, kw) tap
is a static row slice + static C-multiple lane shift, and the per-channel
weights broadcast along lanes as an OW-tiled constant vector:

    acc[b, oh, ow·C + c] += x[b, oh+kh, (ow+kw)·C + c] * w[kh, kw, c]

int32 accumulation, exact zero-point correction via per-channel tap-sums, and
the fused dequant(+ReLU+affine-requant) epilogue — one HBM read of the image,
one write of the output, nothing else.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _kernel(scal_ref, zp_ref, x_ref, w_ref, ws_ref, cs_ref, b_ref,
            out_ref, *, KH: int, KW: int, OH: int, OW: int, C: int,
            requant: bool, requant_affine: bool, relu: bool,
            act_max: bool):
    bb = x_ref.shape[0]
    acc = jnp.zeros((bb, OH, OW * C), jnp.int32)
    for kh in range(KH):
        for kw in range(KW):
            win = x_ref[:, kh:kh + OH, kw * C:(kw + OW) * C]
            acc = acc + win.astype(jnp.int32) * w_ref[kh * KW + kw]
    act_scale = scal_ref[0, 0]
    zp = zp_ref[0, 0]
    corrected = acc - zp * cs_ref[:]
    y = corrected.astype(jnp.float32) * (act_scale * ws_ref[:]) + b_ref[:]
    if relu:
        y = jnp.maximum(y, 0.0)
    if act_max:
        y = jnp.minimum(y, scal_ref[0, 3])       # relu6-style upper clip
    if requant:
        if requant_affine:
            q = jnp.round(y / scal_ref[0, 1] + scal_ref[0, 2])
            y = jnp.clip(q, 0.0, 255.0) - 128.0
        else:
            y = jnp.clip(jnp.round(y / scal_ref[0, 1]), -127.0, 127.0)
    out_ref[:] = y.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bb", "out_dtype", "interpret",
                                             "relu", "act_max"))
def qdepthwise_fused(x_q: Array, w_q: Array, *, act_scale: Array,
                     act_zp: Array, w_scale: Array, colsum: Array,
                     bias: Optional[Array] = None,
                     requant_scale: Optional[Array] = None,
                     requant_zp: Optional[Array] = None, bb: int = 4,
                     out_dtype=jnp.float32, interpret: bool = False,
                     relu: bool = False,
                     act_max: Optional[float] = None) -> Array:
    """Stride-1 VALID depthwise conv: (B,Hp,Wp,C) × (KH,KW,1,C) → (B,OH,OW,C).

    ``x_q`` pre-padded with the zero point (qconv.pad_for_conv).  ``colsum[c]
    = Σ_{kh,kw} w_q[kh,kw,0,c]``.  Scalar conventions as in qmatmul_fused.
    """
    B, Hp, Wp, C = x_q.shape
    KH, KW, one, C2 = w_q.shape
    assert one == 1 and C == C2, (x_q.shape, w_q.shape)
    OH, OW = Hp - KH + 1, Wp - KW + 1
    bb = min(bb, B)
    assert B % bb == 0, (B, bb)
    if bias is None:
        bias = jnp.zeros((C,), jnp.float32)
    requant = requant_scale is not None
    rq_scale = (jnp.maximum(jnp.asarray(requant_scale, jnp.float32), 1e-12)
                if requant else jnp.ones((), jnp.float32))
    if requant_zp is None:   # symmetric requant grid (zp slot unused)
        rzp, rlo = jnp.float32(0.0), jnp.float32(0.0)
    else:
        rzp = jnp.asarray(requant_zp, jnp.float32) + 128.0
        rlo = jnp.float32(0.0)
    if act_max is not None:
        rlo = jnp.float32(act_max)   # slot 3 reused for the upper clip
    scal = jnp.stack([jnp.asarray(act_scale, jnp.float32).reshape(()),
                      rq_scale.reshape(()), rzp.reshape(()),
                      rlo.reshape(())]).reshape(1, 4)
    zp = jnp.asarray(act_zp, jnp.int32).reshape(1, 1)
    # per-channel vectors tiled along the OW·C lane layout
    tile = lambda v: jnp.tile(jnp.asarray(v).reshape(1, C), (1, OW))
    ws = tile(jnp.asarray(w_scale, jnp.float32))
    cs = tile(jnp.asarray(colsum, jnp.int32))
    b = tile(jnp.asarray(bias, jnp.float32))
    # weights as (KH*KW, OW·C) int32 rows, ready to broadcast-multiply
    w_t = jnp.tile(w_q.reshape(KH * KW, C).astype(jnp.int32), (1, OW))
    x3 = x_q.reshape(B, Hp, Wp * C)

    kern = functools.partial(_kernel, KH=KH, KW=KW, OH=OH, OW=OW, C=C,
                             requant=requant,
                             requant_affine=requant_zp is not None, relu=relu,
                             act_max=act_max is not None)
    out = pl.pallas_call(
        kern,
        grid=(B // bb,),
        in_specs=[
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((bb, Hp, Wp * C), lambda i: (i, 0, 0)),
            pl.BlockSpec((KH * KW, OW * C), lambda i: (0, 0)),
            pl.BlockSpec((1, OW * C), lambda i: (0, 0)),
            pl.BlockSpec((1, OW * C), lambda i: (0, 0)),
            pl.BlockSpec((1, OW * C), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bb, OH, OW * C), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, OH, OW * C), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * OH * OW * C * KH * KW,
            bytes_accessed=B * Hp * Wp * C + B * OH * OW * C,
            transcendentals=0),
        interpret=interpret,
    )(scal, zp, x3, w_t, ws, cs, b)
    return out.reshape(B, OH, OW, C)

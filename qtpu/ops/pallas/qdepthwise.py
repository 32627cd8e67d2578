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


def _kernel(scal_ref, x_ref, w_ref, a_ref, b_ref,
            out_ref, *, KH: int, KW: int, OH: int, OW: int, C: int,
            requant: bool, shift: float, relu: bool,
            act_max: bool):
    bb = x_ref.shape[0]
    acc = jnp.zeros((bb, OH, OW * C), jnp.int32)
    for kh in range(KH):
        for kw in range(KW):
            win = x_ref[:, kh:kh + OH, kw * C:(kw + OW) * C]
            acc = acc + win.astype(jnp.int32) * w_ref[kh * KW + kw]
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
    out_ref[:] = t.astype(out_ref.dtype)


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
    # fold the epilogue ONCE (shared helper => bit-identical to the XLA
    # path), then tile the per-channel rows along the OW·C lane layout
    from qtpu.ops import qops
    co, mode = qops.epilogue_coeffs(
        act_scale=act_scale, act_zp=act_zp, w_scale=w_scale, colsum=colsum,
        bias=bias, requant_scale=requant_scale, requant_zp=requant_zp,
        relu=relu, act_max=act_max)
    hi = (co.hi if mode.requant
          else jnp.float32(act_max if act_max is not None else 0.0))
    scal = jnp.stack([jnp.asarray(co.lo, jnp.float32).reshape(()),
                      jnp.asarray(hi, jnp.float32).reshape(())]).reshape(1, 2)
    tile = lambda v: jnp.tile(jnp.asarray(v).reshape(1, C), (1, OW))
    a_row = tile(co.A)
    b_row = tile(co.B)
    # weights as (KH*KW, OW·C) int32 rows, ready to broadcast-multiply
    w_t = jnp.tile(w_q.reshape(KH * KW, C).astype(jnp.int32), (1, OW))
    x3 = x_q.reshape(B, Hp, Wp * C)

    kern = functools.partial(_kernel, KH=KH, KW=KW, OH=OH, OW=OW, C=C,
                             requant=mode.requant, shift=mode.shift,
                             relu=relu,
                             act_max=act_max is not None)
    out = pl.pallas_call(
        kern,
        grid=(B // bb,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((bb, Hp, Wp * C), lambda i: (i, 0, 0)),
            pl.BlockSpec((KH * KW, OW * C), lambda i: (0, 0)),
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
    )(scal, x3, w_t, a_row, b_row)
    return out.reshape(B, OH, OW, C)

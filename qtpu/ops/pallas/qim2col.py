"""Strided K×K int8 conv as im2col + the fused Pallas GEMM.

Bit-exact alternative formulation of a strided conv.  MEASURED CAVEAT (v5e,
round 1): for the ResNet stem (Ci=3) the XLA-side patch materialization is
pathological — 49 strided slices + concat on a 3-lane minor dim relayout at
~0.1 TOPS, 100× slower than XLA's own conv.  Useful only where the tap slices
are lane-aligned (Ci a multiple of 128); the stem fix belongs in-kernel
(space-to-depth + static taps — see ROADMAP.md #2).

Exactness: K is padded to a lane-friendly multiple with ZERO weight rows, so
the integer accumulator, the per-channel colsums, and the zero-point
correction are unchanged — bit-identical to ``qops.qconv2d`` + epilogue.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from qtpu.ops import qops
from qtpu.ops.pallas.qmatmul import qmatmul_fused

Array = jax.Array


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def qconv2d_im2col(x_q: Array, w_q: Array, *, strides: Tuple[int, int],
                   act_scale: Array, act_zp: Array, w_scale: Array,
                   colsum: Array, bias: Optional[Array] = None,
                   requant_scale: Optional[Array] = None,
                   requant_zp: Optional[Array] = None, relu: bool = False,
                   out_dtype=jnp.float32, interpret: bool = False) -> Array:
    """SAME-padded strided int8 conv via patch-GEMM.

    (B,H,W,Ci) × (KH,KW,Ci,Co) → (B,OH,OW,Co).  Scalar conventions as in
    ``qmatmul_fused``; ``colsum`` over the real taps only.
    """
    B, H, W, Ci = x_q.shape
    KH, KW, Ci2, Co = w_q.shape
    assert Ci == Ci2
    sh, sw = strides
    OH, OW = -(-H // sh), -(-W // sw)
    pads = qops.same_pads((H, W), (KH, KW), strides)
    x_p = jax.lax.pad(
        x_q, act_zp.astype(x_q.dtype),
        ((0, 0, 0), (*pads[0], 0), (*pads[1], 0), (0, 0, 0)))

    taps = []
    for kh in range(KH):
        for kw in range(KW):
            taps.append(jax.lax.slice(
                x_p, (0, kh, kw, 0),
                (B, kh + (OH - 1) * sh + 1, kw + (OW - 1) * sw + 1, Ci),
                (1, sh, sw, 1)))
    patches = jnp.concatenate(taps, axis=-1)          # (B, OH, OW, KH*KW*Ci)
    K = KH * KW * Ci
    Kp = _round_up(max(K, 128), 128)
    if Kp != K:
        patches = jnp.pad(patches, ((0, 0), (0, 0), (0, 0), (0, Kp - K)))
    w_m = w_q.reshape(K, Co)
    if Kp != K:
        w_m = jnp.pad(w_m, ((0, Kp - K), (0, 0)))     # zero rows: exactness
    M = B * OH * OW
    bm = next(c for c in (1024, 512, 256, 128, 64, 32, 16, 8, 4, 2, 1)
              if M % c == 0)
    bn = next(c for c in (512, 256, 128, 64, 32, 16, 8, 4, 2, 1)
              if Co % c == 0)
    y = qmatmul_fused(
        patches.reshape(M, Kp), w_m, act_scale=act_scale, act_zp=act_zp,
        w_scale=w_scale, colsum=colsum, bias=bias,
        requant_scale=requant_scale, requant_zp=requant_zp, relu=relu,
        bm=bm, bn=bn, bk=Kp, out_dtype=out_dtype, interpret=interpret)
    return y.reshape(B, OH, OW, Co)

"""Pallas TPU kernel: fused identity-bottleneck *tail* (conv2+conv3+residual).

Round-2 trace finding (qtpu.bench.tracing, B=128): XLA's cross-fused
[conv2(3×3) → requant → conv3(1×1) + residual → relu → requant] fusion runs
at 38-55% of max(MXU, HBM) on every ResNet-50 identity block.  This kernel
targeted that gap: grid over batch tiles, conv2→conv3 chained in VMEM with
no relayout between them (conv3 is 1×1).

Measured outcome (2026-08-18, scripts/chip_qtail_stage_bench.py, B=128,
bit-exact): the kernel LOSES ~2-3× per stage anyway (l2 1519 vs 717 µs XLA;
l3 666 vs ~260 in-trace) — the per-tap (bb, H, W·C) → (rows, C) window
casts are materialized Mosaic relayouts, the same pathology as qconv and
qblock, and on top of that ANY custom call breaks XLA's scoped-VMEM
activation residency around it (resnet_engine.py use_qproj note).  Kept as
a correct, tested opt-in and as the record of WHY 3-D-blocked conv kernels
do not pay on this toolchain; the zero-cast 2-D forms (qmatmul, qproj2d)
are the competitive shapes.

Epilogues use the folded form (qops.epilogue_coeffs) — bit-identical to the
XLA reference sequence conv_xla → gemm_1x1(+residual) in
qtpu.serve.fused_ops (asserted by tests/test_pallas_qtail.py).

Pixel pairing (``pair``): same Mosaic lane rule as qblock — the
(rows, C) ↔ (bb, H, W·C) casts need C % 128 == 0, so Cmid=64 stages
(ResNet-50 layer1) run 2 adjacent pixels per GEMM row with block-diagonal
weights (2× MACs on a stage bound by traffic, not MXU).
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qtpu.ops import qops

Array = jax.Array


def _kernel(scal_ref, apad_ref, r_ref, w2_ref, w3_ref,
            a2_ref, b2_ref, a3_ref, b3_ref, out_ref, *,
            H: int, W: int, Cmid: int, Cout: int, KH: int, KW: int, P: int):
    bb = apad_ref.shape[0]
    R = bb * H * W // P
    lo2, lo3, c_res = scal_ref[0, 0], scal_ref[0, 1], scal_ref[0, 2]

    acc2 = jnp.zeros((R, Cmid * P), jnp.int32)
    for kh in range(KH):
        for kw in range(KW):
            win = apad_ref[:, kh:kh + H, kw * Cmid:(kw + W) * Cmid]
            acc2 = acc2 + jax.lax.dot_general(
                win.reshape(R, Cmid * P), w2_ref[kh * KW + kw],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    t2 = acc2.astype(jnp.float32) * a2_ref[:] + b2_ref[:]
    b = (jnp.clip(jnp.round(t2), lo2, 255.0) - 128.0).astype(jnp.int8)

    acc3 = jax.lax.dot_general(b, w3_ref[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    t3 = acc3.astype(jnp.float32) * a3_ref[:] + b3_ref[:]
    t3 = t3 + r_ref[:].reshape(R, Cout * P).astype(jnp.float32) * c_res
    out = jnp.clip(jnp.round(t3), lo3, 255.0) - 128.0
    out_ref[:] = out.astype(jnp.int8).reshape(bb, H, W * Cout)


def _grow_bb(B: int, H: int, W: int, P: int, est, rows_cap: int = 8192,
             budget: int = 48 * 2 ** 20) -> int:
    """Batch tile: grow while the GEMM rows stay MXU-friendly AND the VMEM
    estimate (double-buffered blocks + int32 accumulators) stays under ~half
    the 100MB scoped limit (layer4 at bb=128 measured a 116MB stack OOM
    without this)."""
    bb = 1
    while (bb * 2 <= B and B % (bb * 2) == 0
           and bb * 2 * H * W <= rows_cap * P and est(bb * 2) <= budget):
        bb *= 2
    return bb


def _tail_bb(B: int, H: int, W: int, P: int, Cmid: int, Cout: int,
             KH: int = 3) -> int:
    def est(bb: int) -> int:
        rows = bb * H * W // P
        inb = bb * (H + KH - 1) * (W + KH - 1) * Cmid   # padded input block
        io = 2 * bb * H * W * Cout                      # residual + out
        accs = 4 * rows * (Cmid * P + Cout * P)         # acc2 + acc3
        return 2 * (inb + io) + accs
    return _grow_bb(B, H, W, P, est)


@functools.partial(jax.jit,
                   static_argnames=("bb", "pair", "interpret"))
def qtail_fused(a_pad: Array, r_q: Array, *, w2: Array, w3: Array,
                scalars: Array, a2: Array, b2: Array, a3: Array, b3: Array,
                bb: int = 0, pair: int = 1, interpret: bool = False) -> Array:
    """Fused conv2(3×3, stride 1) → requant → conv3(1×1) + residual → requant.

    a_pad: (B, H+KH-1, W+KW-1, Cmid) int8 — conv1's output codes, already
    zero-point-padded for SAME conv2 (pad value = conv2's act_zp).
    r_q: (B, H, W, Cout) int8 residual codes (grid folded into the coeffs).
    w2 (KH*KW, Cmid, Cmid), w3 (Cmid, Cout) int8.  ``scalars`` (1, 3) and
    ``a*/b*`` (1, C) rows come from :func:`tail_coeffs`.  Returns
    (B, H, W, Cout) int8 codes on the next block's input grid.
    """
    B, Hp, Wp, Cmid = a_pad.shape
    KHKW = w2.shape[0]
    KH = KW = int(round(KHKW ** 0.5))
    H, W = Hp - KH + 1, Wp - KW + 1
    Cout = w3.shape[-1]
    P = pair
    assert W % P == 0, f"W={W} not divisible by pair={P}"
    if not interpret:
        assert (Cmid * P) % 128 == 0 and (Cout * P) % 128 == 0, (
            f"pairing {P} incompatible with Cmid={Cmid} Cout={Cout}")
    if not bb:
        bb = _tail_bb(B, H, W, P, Cmid, Cout, KH)
    bb = min(bb, B)
    assert B % bb == 0
    if P > 1:
        eye = jnp.eye(P, dtype=jnp.int8)
        blockdiag = lambda w: jnp.kron(eye, w)
        w2 = jax.vmap(blockdiag)(w2)
        w3 = blockdiag(w3)
        tile = lambda v: jnp.tile(v, (1, P))
        a2, b2, a3, b3 = tile(a2), tile(b2), tile(a3), tile(b3)
    a3d = a_pad.reshape(B, Hp, Wp * Cmid)
    r3d = r_q.reshape(B, H, W * Cout)
    out = pl.pallas_call(
        functools.partial(_kernel, H=H, W=W, Cmid=Cmid, Cout=Cout,
                          KH=KH, KW=KW, P=P),
        grid=(B // bb,),
        in_specs=[
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((bb, Hp, Wp * Cmid), lambda i: (i, 0, 0)),
            pl.BlockSpec((bb, H, W * Cout), lambda i: (i, 0, 0)),
            pl.BlockSpec((KHKW, Cmid * P, Cmid * P), lambda i: (0, 0, 0)),
            pl.BlockSpec((Cmid * P, Cout * P), lambda i: (0, 0)),
            pl.BlockSpec((1, Cmid * P), lambda i: (0, 0)),
            pl.BlockSpec((1, Cmid * P), lambda i: (0, 0)),
            pl.BlockSpec((1, Cout * P), lambda i: (0, 0)),
            pl.BlockSpec((1, Cout * P), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bb, H, W * Cout), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W * Cout), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * Cmid * P * (KH * KW * Cmid + Cout),
            bytes_accessed=B * (Hp * Wp * Cmid + 2 * H * W * Cout),
            transcendentals=0),
        interpret=interpret,
    )(scalars, a3d, r3d, w2, w3, a2, b2, a3, b3)
    return out.reshape(B, H, W, Cout)


def tail_coeffs(c2: Dict[str, Array], c3: Dict[str, Array],
                next_grid: Tuple[Array, ...],
                res_grid: Tuple[Array, ...]) -> Dict[str, Array]:
    """Folded epilogue rows for qtail (qops.epilogue_coeffs both stages).

    ``next_grid``/``res_grid``: (scale, signed zp[, sym]) — the next block's
    input quantizer and the residual codes' grid.  Affine grids only (the
    engine dispatches qtail only for affine policies).
    """
    row = lambda v: jnp.asarray(v, jnp.float32).reshape(1, -1)
    co2, _ = qops.epilogue_coeffs(
        act_scale=c2["act_scale"], act_zp=c2["act_zp"],
        w_scale=c2["w_scale"], colsum=c2["colsum"], bias=c2["bias"],
        requant_scale=c3["act_scale"], requant_zp=c3["act_zp"], relu=True)
    co3, _ = qops.epilogue_coeffs(
        act_scale=c3["act_scale"], act_zp=c3["act_zp"],
        w_scale=c3["w_scale"], colsum=c3["colsum"], bias=c3["bias"],
        requant_scale=next_grid[0], requant_zp=next_grid[1], relu=True,
        res_scale=res_grid[0], res_zp=res_grid[1])
    scal = jnp.stack([co2.lo, co3.lo, co3.C]).reshape(1, 3)
    return dict(scalars=scal, a2=row(co2.A), b2=row(co2.B),
                a3=row(co3.A), b3=row(co3.B))

"""Pallas TPU kernel: a fully-fused int8 ResNet bottleneck (ROADMAP #1).

One kernel runs conv1(1×1) → requant → conv2(3×3, stride 1) → requant →
conv3(1×1) + int8 residual → ReLU → requant, for identity bottleneck blocks.
The only HBM traffic is one read of the block input codes and one write of
the block output codes — everything else lives in VMEM.

Status (measured on-chip 2026-08-17, scripts/chip_qblock_stage_bench.py):
bit-exact vs the 3-op XLA sequence on the real chip, but SLOWER on every
ResNet-50 stage (e.g. 56²: 506µs vs XLA 101µs @ B=32).  The device trace
shows XLA already cross-fuses conv2+conv3+residual into one conv fusion and
interleaves MXU/VPU work, while this kernel runs its three GEMM phases and
fp32 requant epilogues strictly in sequence.  Kept as a correct opt-in
(`ResNetInt8Engine(use_qblock=True)`) and a base for kernel-scheduling
experiments; it is NOT the default serving path.

All three requant epilogues use the folded form (qops.epilogue_coeffs —
round-2 finding: the f32 epilogue chain, not the MXU, bounds these fusions),
so the kernel stays bit-identical to the 3-op XLA reference sequence.

* conv1/conv3 are MXU GEMMs over (bb·H·W, C) views;
* conv2 uses the same static-tap trick as qconv.py on a zp-padded VMEM
  scratch that the kernel fills itself.

Pixel pairing (``pair=2``): Mosaic only supports the (rows, C) ↔
(bb, H, W·C) vector shape casts when C is a multiple of 128 lanes (measured
on-chip: C=64 fails infer-vector-layout, C=128 and the paired
(rows/2, 2C) ↔ (bb, H, (W/2)·2C) forms compile).  For Cmid=64 stages
(ResNet-50 layer1) the kernel therefore processes two adjacent pixels per
GEMM row with block-diagonal weights — 2× the MACs on a stage that is
HBM-bound by ~3×, so the fusion still wins.

Weights/scales for all three convs are VMEM-resident for the whole grid.
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


def _kernel(scal_ref, x_ref, w1_ref, w2_ref, w3_ref,
            a1_ref, b1_ref, a2_ref, b2_ref, a3_ref, b3_ref,
            out_ref, pad_ref, *,
            H: int, W: int, Cin: int, Cmid: int, KH: int, KW: int, P: int):
    bb = x_ref.shape[0]
    R = bb * H * W // P          # GEMM rows: P adjacent pixels per row
    # scalar layout: [lo1, lo2, lo3, C_res] (lo_i = stage i's relu-merged
    # lower code clip, i.e. its requant grid's unsigned zero point)
    lo1, lo2, lo3, c_res = (scal_ref[0, 0], scal_ref[0, 1], scal_ref[0, 2],
                            scal_ref[0, 3])

    x = x_ref[:].reshape(R, Cin * P)
    # ---- conv1: (R, Cin·P) @ blockdiag_P(w1) → folded requant ----
    acc1 = jax.lax.dot_general(x, w1_ref[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    t1 = acc1.astype(jnp.float32) * a1_ref[:] + b1_ref[:]
    a = jnp.clip(jnp.round(t1), lo1, 255.0) - 128.0

    # ---- conv2: zp-pad into scratch, 3x3 static taps ----
    pad_ref[:] = jnp.full_like(pad_ref, scal_ref[0, 4].astype(jnp.int8))
    pad_ref[:, KH // 2:KH // 2 + H, KW // 2 * Cmid:(KW // 2 + W) * Cmid] = (
        a.astype(jnp.int8).reshape(bb, H, W * Cmid))
    acc2 = jnp.zeros((R, Cmid * P), jnp.int32)
    for kh in range(KH):
        for kw in range(KW):
            win = pad_ref[:, kh:kh + H, kw * Cmid:(kw + W) * Cmid]
            acc2 = acc2 + jax.lax.dot_general(
                win.reshape(R, Cmid * P), w2_ref[kh * KW + kw],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    t2 = acc2.astype(jnp.float32) * a2_ref[:] + b2_ref[:]
    b = jnp.clip(jnp.round(t2), lo2, 255.0) - 128.0

    # ---- conv3 + residual + relu + requant to the next block's grid ----
    acc3 = jax.lax.dot_general(b.astype(jnp.int8), w3_ref[:],
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    t3 = acc3.astype(jnp.float32) * a3_ref[:] + b3_ref[:]
    t3 = t3 + x.astype(jnp.float32) * c_res        # int8 residual (zp in B3)
    out = jnp.clip(jnp.round(t3), lo3, 255.0) - 128.0
    out_ref[:] = out.astype(jnp.int8).reshape(bb, H, W * Cin)


@functools.partial(jax.jit, static_argnames=("bb", "pair", "interpret"))
def qbottleneck_fused(x_q: Array, *, w1: Array, w2: Array, w3: Array,
                      scalars: Array, a1: Array, b1: Array,
                      a2: Array, b2: Array, a3: Array, b3: Array,
                      bb: int = 1, pair: int = 1,
                      interpret: bool = False) -> Array:
    """Fused identity bottleneck on int8 codes.

    x_q: (B, H, W, Cin) int8 on the conv1 input grid.  w1 (Cin, Cmid),
    w2 (KH*KW, Cmid, Cmid), w3 (Cmid, Cin) int8.  ``scalars``: (1, 5) f32 and
    ``a*/b*``: (1, C) folded epilogue rows — built by ``block_coeffs``.
    Returns int8 codes on the next block's grid.

    ``pair``: pixels per GEMM row (see module docstring).  The wrapper
    block-diagonalizes the weights and tiles the per-channel rows; W must be
    divisible by ``pair``.
    """
    B, H, W, Cin = x_q.shape
    Cmid = w1.shape[1]
    KHKW = w2.shape[0]
    KH = KW = int(round(KHKW ** 0.5))
    bb = min(bb, B)
    assert B % bb == 0
    P = pair
    assert W % P == 0, f"W={W} not divisible by pair={P}"
    if not interpret:
        # Mosaic lane constraint (module docstring); interpret mode has no
        # layout rules, which lets tests cross-check pair=1 vs pair=2.
        assert (Cmid * P) % 128 == 0 and (Cin * P) % 128 == 0, (
            f"pairing {P} incompatible with Cmid={Cmid} Cin={Cin}")
    if P > 1:
        eye = jnp.eye(P, dtype=jnp.int8)
        blockdiag = lambda w: jnp.kron(eye, w)
        w1, w3 = blockdiag(w1), blockdiag(w3)
        w2 = jax.vmap(blockdiag)(w2)
        tile = lambda v: jnp.tile(v, (1, P))
        a1, b1, a2, b2 = tile(a1), tile(b1), tile(a2), tile(b2)
        a3, b3 = tile(a3), tile(b3)
    x3 = x_q.reshape(B, H, W * Cin)
    out = pl.pallas_call(
        functools.partial(_kernel, H=H, W=W, Cin=Cin, Cmid=Cmid, KH=KH,
                          KW=KW, P=P),
        grid=(B // bb,),
        in_specs=[
            pl.BlockSpec((1, 5), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((bb, H, W * Cin), lambda i: (i, 0, 0)),
            pl.BlockSpec((Cin * P, Cmid * P), lambda i: (0, 0)),
            pl.BlockSpec((KHKW, Cmid * P, Cmid * P), lambda i: (0, 0, 0)),
            pl.BlockSpec((Cmid * P, Cin * P), lambda i: (0, 0)),
            pl.BlockSpec((1, Cmid * P), lambda i: (0, 0)),
            pl.BlockSpec((1, Cmid * P), lambda i: (0, 0)),
            pl.BlockSpec((1, Cmid * P), lambda i: (0, 0)),
            pl.BlockSpec((1, Cmid * P), lambda i: (0, 0)),
            pl.BlockSpec((1, Cin * P), lambda i: (0, 0)),
            pl.BlockSpec((1, Cin * P), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bb, H, W * Cin), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W * Cin), jnp.int8),
        scratch_shapes=[pltpu.VMEM((bb, H + KH - 1, (W + KW - 1) * Cmid),
                                   jnp.int8)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(scalars, x3, w1, w2, w3, a1, b1, a2, b2, a3, b3)
    return out.reshape(B, H, W, Cin)


def block_coeffs(c1: Dict[str, Array], c2: Dict[str, Array],
                 c3: Dict[str, Array], next_grid: Tuple[Array, ...]
                 ) -> Dict[str, Array]:
    """Fold the three stage epilogues (qops.epilogue_coeffs) into the
    kernel's operand set: scalars (1, 5) + per-channel (1, C) rows.

    ``next_grid`` = (scale, signed zp[, sym]) of the NEXT block's input
    quantizer.  Residual codes are on c1's input grid.  All grids must be
    affine (the engine only dispatches qblock for affine policies).
    """
    row = lambda v: jnp.asarray(v, jnp.float32).reshape(1, -1)
    co1, _ = qops.epilogue_coeffs(
        act_scale=c1["act_scale"], act_zp=c1["act_zp"],
        w_scale=c1["w_scale"], colsum=c1["colsum"], bias=c1["bias"],
        requant_scale=c2["act_scale"], requant_zp=c2["act_zp"], relu=True)
    co2, _ = qops.epilogue_coeffs(
        act_scale=c2["act_scale"], act_zp=c2["act_zp"],
        w_scale=c2["w_scale"], colsum=c2["colsum"], bias=c2["bias"],
        requant_scale=c3["act_scale"], requant_zp=c3["act_zp"], relu=True)
    co3, _ = qops.epilogue_coeffs(
        act_scale=c3["act_scale"], act_zp=c3["act_zp"],
        w_scale=c3["w_scale"], colsum=c3["colsum"], bias=c3["bias"],
        requant_scale=next_grid[0], requant_zp=next_grid[1], relu=True,
        res_scale=c1["act_scale"], res_zp=c1["act_zp"])
    # slot 4: conv2's zp-padding value on the SIGNED grid (= lo2 - 128, but
    # kept separate so the pad value stays an exact integer code)
    zpa_s = jnp.asarray(c2["act_zp"], jnp.float32)
    scal = jnp.stack([co1.lo, co2.lo, co3.lo, co3.C,
                      zpa_s.reshape(())]).reshape(1, 5)
    return dict(scalars=scal, a1=row(co1.A), b1=row(co1.B), a2=row(co2.A),
                b2=row(co2.B), a3=row(co3.A), b3=row(co3.B))

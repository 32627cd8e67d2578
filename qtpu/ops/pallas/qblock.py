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

* conv1/conv3 are MXU GEMMs over (bb·H·W, C) views;
* conv2 uses the same static-tap trick as qconv.py on a zp-padded VMEM
  scratch that the kernel fills itself;
* every requant step replicates qops.quantize_act exactly (affine grids),
  so the fused block is bit-identical to the three-op reference sequence
  (tests/test_pallas_qblock.py asserts zero code mismatches).

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
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _requant_affine(y: Array, scale, zp_u) -> Array:
    q = jnp.round(y / scale + zp_u)
    return jnp.clip(q, 0.0, 255.0) - 128.0


def _kernel(scal_ref, x_ref, w1_ref, w2_ref, w3_ref,
            ws1_ref, cs1_ref, b1_ref, ws2_ref, cs2_ref, b2_ref,
            ws3_ref, cs3_ref, b3_ref, out_ref, pad_ref, *,
            H: int, W: int, Cin: int, Cmid: int, KH: int, KW: int, P: int):
    bb = x_ref.shape[0]
    R = bb * H * W // P          # GEMM rows: P adjacent pixels per row
    # scalar layout: [s_x, zp_x_f, s_a, zp_a_u, s_b, zp_b_u, s_out, zp_out_u,
    #                 res_scale, res_zp_f]
    s_x, zpx = scal_ref[0, 0], scal_ref[0, 1]
    s_a, zpa_u = scal_ref[0, 2], scal_ref[0, 3]
    s_b, zpb_u = scal_ref[0, 4], scal_ref[0, 5]
    s_o, zpo_u = scal_ref[0, 6], scal_ref[0, 7]
    res_s, res_z = scal_ref[0, 8], scal_ref[0, 9]

    x = x_ref[:].reshape(R, Cin * P)
    # ---- conv1: (R, Cin·P) @ blockdiag_P(w1), dequant, relu, requant ----
    acc1 = jax.lax.dot_general(x, w1_ref[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    zpx_i = zpx.astype(jnp.int32)
    y1 = (acc1 - zpx_i * cs1_ref[:]).astype(jnp.float32) * (s_x * ws1_ref[:])
    y1 = jnp.maximum(y1 + b1_ref[:], 0.0)
    a = _requant_affine(y1, s_a, zpa_u)                      # f32 codes -128..127

    # ---- conv2: zp-pad into scratch, 3x3 static taps ----
    zpa_s = zpa_u - 128.0
    pad_ref[:] = jnp.full_like(pad_ref, zpa_s.astype(jnp.int8))
    pad_ref[:, KH // 2:KH // 2 + H, KW // 2 * Cmid:(KW // 2 + W) * Cmid] = (
        a.astype(jnp.int8).reshape(bb, H, W * Cmid))
    acc2 = jnp.zeros((R, Cmid * P), jnp.int32)
    for kh in range(KH):
        for kw in range(KW):
            win = pad_ref[:, kh:kh + H, kw * Cmid:(kw + W) * Cmid]
            acc2 = acc2 + jax.lax.dot_general(
                win.reshape(R, Cmid * P), w2_ref[kh * KW + kw],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    zpa_i = (zpa_u - 128.0).astype(jnp.int32)
    y2 = (acc2 - zpa_i * cs2_ref[:]).astype(jnp.float32) * (s_a * ws2_ref[:])
    y2 = jnp.maximum(y2 + b2_ref[:], 0.0)
    b = _requant_affine(y2, s_b, zpb_u)

    # ---- conv3 + residual + relu + requant to the next block's grid ----
    acc3 = jax.lax.dot_general(b.astype(jnp.int8), w3_ref[:],
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    zpb_i = (zpb_u - 128.0).astype(jnp.int32)
    y3 = (acc3 - zpb_i * cs3_ref[:]).astype(jnp.float32) * (s_b * ws3_ref[:])
    y3 = y3 + b3_ref[:]
    y3 = y3 + (x.astype(jnp.float32) - res_z) * res_s        # int8 residual
    y3 = jnp.maximum(y3, 0.0)
    out = _requant_affine(y3, s_o, zpo_u)
    out_ref[:] = out.astype(jnp.int8).reshape(bb, H, W * Cin)


@functools.partial(jax.jit, static_argnames=("bb", "pair", "interpret"))
def qbottleneck_fused(x_q: Array, *, w1: Array, w2: Array, w3: Array,
                      scalars: Array, ws1: Array, cs1: Array, b1: Array,
                      ws2: Array, cs2: Array, b2: Array, ws3: Array,
                      cs3: Array, b3: Array, bb: int = 1, pair: int = 1,
                      interpret: bool = False) -> Array:
    """Fused identity bottleneck on int8 codes.

    x_q: (B, H, W, Cin) int8 on the conv1 input grid.  w1 (Cin, Cmid),
    w2 (KH*KW, Cmid, Cmid), w3 (Cmid, Cin) int8.  ``scalars``: (1, 10) f32 —
    see the kernel's layout comment; built by ``block_scalars``.  Per-channel
    vectors are (1, C) rows.  Returns int8 codes on the next block's grid.

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
        ws1, cs1, b1 = tile(ws1), tile(cs1), tile(b1)
        ws2, cs2, b2 = tile(ws2), tile(cs2), tile(b2)
        ws3, cs3, b3 = tile(ws3), tile(cs3), tile(b3)
    x3 = x_q.reshape(B, H, W * Cin)
    out = pl.pallas_call(
        functools.partial(_kernel, H=H, W=W, Cin=Cin, Cmid=Cmid, KH=KH,
                          KW=KW, P=P),
        grid=(B // bb,),
        in_specs=[
            pl.BlockSpec((1, 10), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((bb, H, W * Cin), lambda i: (i, 0, 0)),
            pl.BlockSpec((Cin * P, Cmid * P), lambda i: (0, 0)),
            pl.BlockSpec((KHKW, Cmid * P, Cmid * P), lambda i: (0, 0, 0)),
            pl.BlockSpec((Cmid * P, Cin * P), lambda i: (0, 0)),
            pl.BlockSpec((1, Cmid * P), lambda i: (0, 0)),
            pl.BlockSpec((1, Cmid * P), lambda i: (0, 0)),
            pl.BlockSpec((1, Cmid * P), lambda i: (0, 0)),
            pl.BlockSpec((1, Cmid * P), lambda i: (0, 0)),
            pl.BlockSpec((1, Cmid * P), lambda i: (0, 0)),
            pl.BlockSpec((1, Cmid * P), lambda i: (0, 0)),
            pl.BlockSpec((1, Cin * P), lambda i: (0, 0)),
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
    )(scalars, x3, w1, w2, w3, ws1, cs1, b1, ws2, cs2, b2, ws3, cs3, b3)
    return out.reshape(B, H, W, Cin)


def block_scalars(c1: Dict[str, Array], c2: Dict[str, Array],
                  c3: Dict[str, Array], next_grid: Tuple[Array, ...]
                  ) -> Array:
    """Pack the (1, 10) scalar vector from frozen conv nodes.

    ``next_grid`` = (scale, signed zp[, sym]) of the NEXT block's input
    quantizer.  Residual codes are on c1's input grid.  All grids must be
    affine (the engine only dispatches qblock for affine policies).
    """
    to_u = lambda zp: zp.astype(jnp.float32) + 128.0
    vals = [c1["act_scale"], c1["act_zp"].astype(jnp.float32),
            c2["act_scale"], to_u(c2["act_zp"]),
            c3["act_scale"], to_u(c3["act_zp"]),
            next_grid[0], to_u(next_grid[1]),
            c1["act_scale"], c1["act_zp"].astype(jnp.float32)]
    return jnp.stack([jnp.asarray(v, jnp.float32).reshape(()) for v in vals]
                     ).reshape(1, 10)

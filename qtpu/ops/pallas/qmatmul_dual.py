"""Pallas TPU kernel: dual-input fused int8 GEMM for projection bottlenecks.

A ResNet projection block ends with two 1x1 convolutions whose outputs are
summed: conv3 (on the 3x3's output codes) and the strided downsample (on the
block's input codes).  The XLA path materializes the downsample output in
fp32 HBM (411 MB at B=128 on layer1_0) only for conv3's fusion to read it
back — measured 1.4 ms of pure residual traffic per step across the four
projection blocks (qtpu/bench/tracing.py, 2026-08-17).

This kernel computes both GEMMs in one pass — two int32 MXU contractions per
(bm, bn) tile — and applies each operand's own dequant epilogue before the
fp32 sum, ReLU, and requantization to the next block's int8 grid.  The fp32
intermediate never exists in HBM: traffic drops from
``x1 + x2 + 4*M*N (write) + 4*M*N (read) + M*N`` to ``x1 + x2 + M*N`` bytes.

Float semantics replicate the engine's XLA path bit-for-bit: the sum is
grouped as ``(deq1(acc1) + b1) + (deq2(acc2) + b2)`` — the same association
the separate-conv path produces — and the requant step matches
``qops.quantize_act`` exactly (tests/test_pallas_qmatmul_dual.py).

No reference counterpart: the upstream repo has no native kernels
(SURVEY.md SS2.2; mount empty, SS0).  Designed per pallas_guide.md.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _kernel(scal_ref, zp_ref, x1_ref, w1_ref, ws1_ref, cs1_ref, b1_ref,
            x2_ref, w2_ref, ws2_ref, cs2_ref, b2_ref, out_ref, *,
            requant: bool, requant_affine: bool, relu: bool):
    acc1 = jax.lax.dot_general(x1_ref[:], w1_ref[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    acc2 = jax.lax.dot_general(x2_ref[:], w2_ref[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    s1, s2 = scal_ref[0, 0], scal_ref[0, 1]
    zp1, zp2 = zp_ref[0, 0], zp_ref[0, 1]
    # Grouping matters for fp32 bit-parity with the separate-conv XLA path:
    # (conv3 output incl bias) + (downsample output incl bias).
    y1 = (acc1 - zp1 * cs1_ref[:]).astype(jnp.float32) * (s1 * ws1_ref[:])
    y2 = (acc2 - zp2 * cs2_ref[:]).astype(jnp.float32) * (s2 * ws2_ref[:])
    y = (y1 + b1_ref[:]) + (y2 + b2_ref[:])
    if relu:
        y = jnp.maximum(y, 0.0)
    if requant:
        # bit-matching qops.quantize_act (see qmatmul.py epilogue)
        if requant_affine:
            q = jnp.round(y / scal_ref[0, 2] + scal_ref[0, 3])
            y = jnp.clip(q, 0.0, 255.0) - 128.0
        else:
            y = jnp.clip(jnp.round(y / scal_ref[0, 2]), -127.0, 127.0)
    out_ref[:] = y.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("bm", "bn", "out_dtype", "interpret", "relu"))
def qmatmul_dual(x1: Array, w1: Array, x2: Array, w2: Array, *,
                 act_scale1: Array, act_zp1: Array, w_scale1: Array,
                 colsum1: Array, bias1: Optional[Array],
                 act_scale2: Array, act_zp2: Array, w_scale2: Array,
                 colsum2: Array, bias2: Optional[Array],
                 requant_scale: Optional[Array] = None,
                 requant_zp: Optional[Array] = None,
                 relu: bool = True, bm: int = 1024, bn: int = 512,
                 out_dtype=jnp.int8, interpret: bool = False) -> Array:
    """``deq1(x1 @ w1) + deq2(x2 @ w2)`` fused with ReLU + requantization.

    ``x1`` (M, K1) / ``x2`` (M, K2) int8 codes on their layers' input grids;
    ``w1`` (K1, N) / ``w2`` (K2, N) int8.  Each operand carries its own
    act_scale (f32 scalar), act_zp (int32 scalar, signed grid), per-channel
    w_scale/colsum/bias (N,).  K is not tiled: both weight panels stay
    VMEM-resident per (bm, bn) step (serving K <= 1024).

    ``requant_scale``/``requant_zp``: next consumer's grid; ``requant_zp``
    None selects the symmetric path.  With requant the output is int8 codes.
    """
    M, K1 = x1.shape
    M2, K2 = x2.shape
    N = w1.shape[1]
    assert M == M2 and w1.shape == (K1, N) and w2.shape == (K2, N), (
        x1.shape, w1.shape, x2.shape, w2.shape)
    bm, bn = min(bm, M), min(bn, N)
    assert M % bm == 0 and N % bn == 0, (M, N, bm, bn)
    if bias1 is None:
        bias1 = jnp.zeros((N,), jnp.float32)
    if bias2 is None:
        bias2 = jnp.zeros((N,), jnp.float32)
    requant = requant_scale is not None
    rq_scale = (jnp.maximum(jnp.asarray(requant_scale, jnp.float32), 1e-12)
                if requant else jnp.ones((), jnp.float32))
    rzp = (jnp.asarray(requant_zp, jnp.float32) + 128.0
           if requant_zp is not None else jnp.float32(0.0))
    scal = jnp.stack([jnp.asarray(act_scale1, jnp.float32).reshape(()),
                      jnp.asarray(act_scale2, jnp.float32).reshape(()),
                      rq_scale.reshape(()), rzp.reshape(())]).reshape(1, 4)
    zp = jnp.stack([jnp.asarray(act_zp1, jnp.int32).reshape(()),
                    jnp.asarray(act_zp2, jnp.int32).reshape(())]).reshape(1, 2)
    row_f = lambda v: jnp.asarray(v, jnp.float32).reshape(1, N)
    row_i = lambda v: jnp.asarray(v, jnp.int32).reshape(1, N)

    grid = (M // bm, N // bn)
    vec = pl.BlockSpec((1, bn), lambda i, j: (0, j))
    return pl.pallas_call(
        functools.partial(_kernel, requant=requant,
                          requant_affine=requant_zp is not None, relu=relu),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 4), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((bm, K1), lambda i, j: (i, 0)),
            pl.BlockSpec((K1, bn), lambda i, j: (0, j)),
            vec, vec, vec,
            pl.BlockSpec((bm, K2), lambda i, j: (i, 0)),
            pl.BlockSpec((K2, bn), lambda i, j: (0, j)),
            vec, vec, vec,
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * (K1 + K2),
            bytes_accessed=M * (K1 + K2) + (K1 + K2) * N + M * N,
            transcendentals=0),
        interpret=interpret,
    )(scal, zp,
      x1, w1, row_f(w_scale1), row_i(colsum1), row_f(bias1),
      x2, w2, row_f(w_scale2), row_i(colsum2), row_f(bias2))

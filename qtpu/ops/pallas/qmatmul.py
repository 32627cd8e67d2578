"""Pallas TPU kernel: fused int8 quantized matmul with dequant epilogue.

The performance-bearing serving primitive (SURVEY.md §2.2 "Fused
quantize→matmul→dequantize"; mount empty, §0 — design per pallas_guide.md, not
translated from the reference, which has no native kernels).

Computes, in one kernel pass on the MXU int8 path::

    out[m, n] = act_scale * w_scale[n] * (Σ_k x_q[m,k]·w_q[k,n]
                                          − act_zp * colsum[n]) + bias[n]

* grid (M/bm, N/bn, K/bk), K innermost ("arbitrary"), int32 accumulator held
  in VMEM scratch across K steps;
* the dequant epilogue (zero-point correction, per-channel scales, bias) runs
  on the VPU on the final K step while the accumulator tile is still in VMEM —
  no extra HBM round-trip for the int32 accumulator;
* per-channel vectors are passed as (1, N) rows so their blocks ride the lane
  dimension; scalars live in SMEM.

The XLA reference implementation (``qtpu.ops.qops``) is the numerical oracle:
tests assert exact match on the integer accumulator and float-exact epilogue.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qtpu.ops import qops

Array = jax.Array


def _kernel(scal_ref, x_ref, w_ref, a_ref, b_ref,
            *rest, requant: bool, shift: float, relu: bool,
            act_max: bool, residual: bool, w_packed: bool):
    if residual:
        res_ref, out_ref, acc_ref = rest
    else:
        out_ref, acc_ref = rest
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    if w_packed:
        # int4 nibbles unpacked HERE, in VMEM — the packed (bk, bn/2) block
        # is all that crosses HBM (half the int8 weight traffic; SURVEY §7.2
        # "unpack inside the kernel").  pack_int4_halves layout: low nibble =
        # tile column t, high nibble = tile column t + bn/2.  Sign-extend in
        # int32 (Mosaic's int8 shift support is narrower), cast back to int8
        # so both dots still ride the MXU int8 path.
        wp = w_ref[:].astype(jnp.int32)
        w_lo = ((wp << 28) >> 28).astype(jnp.int8)
        w_hi = (wp >> 4).astype(jnp.int8)
        half = w_ref.shape[1]
        acc_ref[:, :half] += jax.lax.dot_general(
            x_ref[:], w_lo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        acc_ref[:, half:] += jax.lax.dot_general(
            x_ref[:], w_hi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
    else:
        acc_ref[:] += jax.lax.dot_general(
            x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    @pl.when(k == pl.num_programs(2) - 1)
    def _epilogue():
        # folded form (qops.epilogue_coeffs): t = acc·A + B [+ r·C], then
        # clip(round(t), lo, hi) − shift — bit-identical to the XLA path in
        # qtpu.serve.fused_ops, which folds with the same helper.
        t = acc_ref[:].astype(jnp.float32) * a_ref[:] + b_ref[:]
        if residual:
            # fused residual add: int8 codes' grid is folded into (B, C)
            # (identity skip branches add ZERO extra f32 HBM traffic).
            t = t + res_ref[:].astype(jnp.float32) * scal_ref[0, 0]
        if requant:
            t = jnp.clip(jnp.round(t), scal_ref[0, 1], scal_ref[0, 2]) - shift
        else:
            if relu:
                t = jnp.maximum(t, 0.0)
            if act_max:
                t = jnp.minimum(t, scal_ref[0, 2])
        out_ref[:] = t.astype(out_ref.dtype)


def pack_int4_halves(w: Array, bn: int) -> Array:
    """Pack unpacked int4 codes (int8 (K, N), values in ±7) for the kernel's
    in-VMEM unpack: within each ``bn``-column tile, byte ``t`` holds tile
    column ``t`` (low nibble) and tile column ``t + bn/2`` (high nibble).
    Requires N % bn == 0 and (bn/2) % 128 == 0 (lane-sliceable halves).
    """
    K, N = w.shape
    assert N % bn == 0 and (bn // 2) % 128 == 0, (N, bn)
    t = w.reshape(K, N // bn, 2, bn // 2)
    lo, hi = t[:, :, 0, :], t[:, :, 1, :]
    return ((lo & 0x0F) | (hi << 4)).astype(jnp.int8).reshape(K, N // 2)


@functools.partial(
    jax.jit, static_argnames=("bm", "bn", "bk", "out_dtype", "interpret", "relu", "act_max", "w_packed"))
def qmatmul_fused(x_q: Array, w_q: Array, *, act_scale: Array, act_zp: Array,
                  w_scale: Array, colsum: Array, bias: Optional[Array] = None,
                  requant_scale: Optional[Array] = None,
                  requant_zp: Optional[Array] = None,
                  residual: Optional[Array] = None,
                  res_scale: Optional[Array] = None,
                  res_zp: Optional[Array] = None,
                  bm: int = 1024, bn: int = 512, bk: int = 4096,
                  out_dtype=jnp.float32, interpret: bool = False,
                  relu: bool = False,
                  act_max: Optional[float] = None,
                  w_packed: bool = False) -> Array:
    """int8 (M,K) × int8 (K,N) → out_dtype (M,N) with fused dequant.

    Shapes must tile evenly (pad at the call site; serving shapes are static).
    ``w_scale``/``colsum``/``bias`` are (N,); ``act_scale`` scalar f32;
    ``act_zp`` scalar int32 (0 for symmetric activations).

    ``requant_scale``: if given (with ``out_dtype=jnp.int8``), the epilogue
    also requantizes onto the next layer's symmetric int8 grid — the full
    quantize→matmul→dequantize→requantize chain stays in VMEM, quartering the
    HBM write traffic vs an f32 output.
    """
    M, K = x_q.shape
    K2, N = w_q.shape
    if w_packed:
        N *= 2          # w_q is pack_int4_halves output: (K, N/2) bytes
    assert K == K2, (x_q.shape, w_q.shape)
    bm, bn, bk = min(bm, M), min(bn, N), min(bk, K)
    assert M % bm == 0 and N % bn == 0 and K % bk == 0, (
        f"shapes ({M},{N},{K}) must tile by ({bm},{bn},{bk})")
    if w_packed:
        assert (bn // 2) % 128 == 0, (
            f"packed int4 needs lane-sliceable halves: bn={bn}")
    # fold the epilogue ONCE (shared helper => bit-identical to the XLA
    # path in qtpu.serve.fused_ops)
    res_int8 = residual is not None and residual.dtype == jnp.int8
    co, mode = qops.epilogue_coeffs(
        act_scale=act_scale, act_zp=act_zp, w_scale=w_scale, colsum=colsum,
        bias=bias, requant_scale=requant_scale, requant_zp=requant_zp,
        relu=relu, act_max=act_max,
        res_scale=res_scale if res_int8 else None,
        res_zp=res_zp if res_int8 else None,
        res_f32=residual is not None and not res_int8)
    # scalar row: [C, lo, hi] (hi doubles as the f32-mode act_max clip)
    hi = (co.hi if mode.requant
          else jnp.float32(act_max if act_max is not None else 0.0))
    scal = jnp.stack([jnp.asarray(co.C, jnp.float32).reshape(()),
                      jnp.asarray(co.lo, jnp.float32).reshape(()),
                      jnp.asarray(hi, jnp.float32).reshape(())]).reshape(1, 3)
    a_row = co.A.reshape(1, N)
    b_row = co.B.reshape(1, N)

    grid = (M // bm, N // bn, K // bk)
    in_specs = [
        pl.BlockSpec((1, 3), lambda i, j, k: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
        pl.BlockSpec((bk, bn // 2 if w_packed else bn),
                     lambda i, j, k: (k, j)),
        pl.BlockSpec((1, bn), lambda i, j, k: (0, j)),
        pl.BlockSpec((1, bn), lambda i, j, k: (0, j)),
    ]
    inputs = [scal, x_q, w_q, a_row, b_row]
    if residual is not None:
        assert residual.shape == (M, N), residual.shape
        in_specs.append(pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)))
        inputs.append(residual)
    return pl.pallas_call(
        functools.partial(_kernel, requant=mode.requant, shift=mode.shift,
                          relu=relu,
                          act_max=act_max is not None,
                          residual=residual is not None, w_packed=w_packed),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K + K * N + M * N * 4,
            transcendentals=0),
        interpret=interpret,
    )(*inputs)

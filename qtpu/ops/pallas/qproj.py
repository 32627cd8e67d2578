"""Pallas TPU kernel: fused projection-block tail (conv3 + downsample).

A ResNet projection block ends in ``conv3(b) + downsample(x)`` — two 1×1
GEMMs whose sum feeds relu→requant.  The engine's XLA path materializes the
downsample output in **f32 HBM** (e.g. ResNet-50 layer1_0 at B=128: a 411 MB
round trip; the round-2 trace shows that single block costing 1.46 ms/step,
16% of the forward).  This kernel computes both GEMMs, the sum, relu and the
requant in one VMEM pass: traffic drops to the two int8 inputs + one int8
output.

The 2-D form (qproj2d_fused) is the performant shape: zero vector-layout
casts, and measured 1.8-4.4× faster than the XLA fusion pair per stage,
bit-exact (scripts/chip_2d_bench.py: l1_0 664 vs 1551 µs, l3_0 121 vs 536).
It is still OFF by default in the engine: a custom call inside the XLA
program breaks scoped-VMEM activation residency around it and costs more
e2e than the kernel saves (resnet_engine.py use_qproj note) — it wins when
serving stages standalone or once whole-program Pallas serving lands.
The epilogue mirrors the XLA reference order exactly — the downsample
branch is dequantized on its own (unrequantized) folded coefficients, then
added via the requant-scaled C — so outputs stay bit-identical to the
gemm_1x1(f32) → gemm_1x1(+residual) sequence (tests/test_pallas_qproj.py).

Pixel pairing (``pair``): same Mosaic lane rule as qtail — Cmid=Cin=64
stages (layer1_0) run 2 adjacent pixels per GEMM row with block-diagonal
weights.

Chaining note: the engine quantizes a block input ONCE (on conv1's grid)
and reuses those codes for the downsample branch, accepting a sub-step
grid mismatch (resnet_engine.py chaining note) — this kernel inherits
exactly that convention from the XLA path it replaces.
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


def _kernel(scal_ref, b_ref, xd_ref, w3_ref, wd_ref,
            a3_ref, b3_ref, ad_ref, bd_ref, out_ref, *,
            H: int, W: int, Cmid: int, Cin: int, Cout: int, P: int):
    bb = b_ref.shape[0]
    R = bb * H * W // P
    lo, c_inv = scal_ref[0, 0], scal_ref[0, 1]

    acc_a = jax.lax.dot_general(
        b_ref[:].reshape(R, Cmid * P), w3_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    acc_d = jax.lax.dot_general(
        xd_ref[:].reshape(R, Cin * P), wd_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    # downsample branch dequantized on its own coefficients first (mirrors
    # the XLA f32-residual order bit-for-bit), then folded into the requant
    td = acc_d.astype(jnp.float32) * ad_ref[:] + bd_ref[:]
    t = acc_a.astype(jnp.float32) * a3_ref[:] + b3_ref[:] + td * c_inv
    out = jnp.clip(jnp.round(t), lo, 255.0) - 128.0
    out_ref[:] = out.astype(jnp.int8).reshape(bb, H, W * Cout)


@functools.partial(jax.jit, static_argnames=("bb", "pair", "interpret"))
def qproj_fused(b_q: Array, xd_q: Array, *, w3: Array, wd: Array,
                scalars: Array, a3: Array, b3: Array, ad: Array, bd: Array,
                bb: int = 0, pair: int = 1, interpret: bool = False) -> Array:
    """conv3(b_q) + downsample(xd_q) → relu → requant, one fused pass.

    b_q: (B, H, W, Cmid) int8 (conv2's output codes); xd_q: (B, H, W, Cin)
    int8 (the block input codes, stride-sliced by the caller).  w3
    (Cmid, Cout), wd (Cin, Cout) int8.  ``scalars`` (1, 2) and the (1, C)
    rows come from :func:`proj_coeffs`.  Returns (B, H, W, Cout) int8 codes
    on the next block's input grid.
    """
    from qtpu.ops.pallas.qtail import _grow_bb

    B, H, W, Cmid = b_q.shape
    Cin = xd_q.shape[-1]
    Cout = w3.shape[-1]
    P = pair
    assert W % P == 0, f"W={W} not divisible by pair={P}"
    if not interpret:
        assert ((Cmid * P) % 128 == 0 and (Cin * P) % 128 == 0
                and (Cout * P) % 128 == 0), (
            f"pairing {P} incompatible with {Cmid}/{Cin}/{Cout}")
    if not bb:
        def est(bbi: int) -> int:
            rows = bbi * H * W // P
            inb = bbi * H * W * (Cmid + Cin)
            io = bbi * H * W * Cout
            accs = 2 * 4 * rows * Cout * P        # acc_a + acc_d
            return 2 * (inb + io) + accs
        bb = _grow_bb(B, H, W, P, est, rows_cap=4096)
    bb = min(bb, B)
    assert B % bb == 0
    if P > 1:
        eye = jnp.eye(P, dtype=jnp.int8)
        w3 = jnp.kron(eye, w3)
        wd = jnp.kron(eye, wd)
        tile = lambda v: jnp.tile(v, (1, P))
        a3, b3, ad, bd = tile(a3), tile(b3), tile(ad), tile(bd)
    b3d = b_q.reshape(B, H, W * Cmid)
    xd3d = xd_q.reshape(B, H, W * Cin)
    out = pl.pallas_call(
        functools.partial(_kernel, H=H, W=W, Cmid=Cmid, Cin=Cin, Cout=Cout,
                          P=P),
        grid=(B // bb,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((bb, H, W * Cmid), lambda i: (i, 0, 0)),
            pl.BlockSpec((bb, H, W * Cin), lambda i: (i, 0, 0)),
            pl.BlockSpec((Cmid * P, Cout * P), lambda i: (0, 0)),
            pl.BlockSpec((Cin * P, Cout * P), lambda i: (0, 0)),
            pl.BlockSpec((1, Cout * P), lambda i: (0, 0)),
            pl.BlockSpec((1, Cout * P), lambda i: (0, 0)),
            pl.BlockSpec((1, Cout * P), lambda i: (0, 0)),
            pl.BlockSpec((1, Cout * P), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bb, H, W * Cout), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W * Cout), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * P * Cout * (Cmid + Cin),
            bytes_accessed=B * H * W * (Cmid + Cin + Cout),
            transcendentals=0),
        interpret=interpret,
    )(scalars, b3d, xd3d, w3, wd, a3, b3, ad, bd)
    return out.reshape(B, H, W, Cout)


def _kernel2d(scal_ref, b_ref, xd_ref, w3_ref, wd_ref,
              a3_ref, b3_ref, ad_ref, bd_ref, out_ref):
    lo, c_inv = scal_ref[0, 0], scal_ref[0, 1]
    acc_a = jax.lax.dot_general(b_ref[:], w3_ref[:], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
    acc_d = jax.lax.dot_general(xd_ref[:], wd_ref[:],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
    td = acc_d.astype(jnp.float32) * ad_ref[:] + bd_ref[:]
    t = acc_a.astype(jnp.float32) * a3_ref[:] + b3_ref[:] + td * c_inv
    out_ref[:] = (jnp.clip(jnp.round(t), lo, 255.0) - 128.0).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("bm", "interpret", "vmem_mb"))
def qproj2d_fused(b_q: Array, xd_q: Array, *, w3: Array, wd: Array,
                  scalars: Array, a3: Array, b3: Array, ad: Array, bd: Array,
                  bm: int = 0, interpret: bool = False,
                  vmem_mb: int = 48) -> Array:
    """2-D form of :func:`qproj_fused`: (M, C) operands, zero layout casts.

    The 3-D block form pays Mosaic vector relayouts for its
    (bb, H, W·C) ↔ (rows, C) casts on every operand (measured 2-3× slower
    than the XLA fusions it replaces — same pathology as qblock/qtail).
    The NHWC→(M, C) reshape is done by the CALLER in XLA instead, where it
    is a free byte-identity for lane-aligned C, and every kernel operand
    then lives in its native (rows, lanes) layout.  K stays untiled (the
    contraction dims here are 64–1024).
    """
    M, Cmid = b_q.shape
    Cin = xd_q.shape[-1]
    Cout = w3.shape[-1]
    if not bm:
        # largest divisor of M that keeps the two int32 accumulators under
        # ~24MB of VMEM (M = B·H·W is rarely a power of two — scan divisors)
        cap = min(M, max(256, (24 * 2 ** 20) // (8 * Cout)))
        bm = 8
        for d in range(cap, 7, -8):
            if M % d == 0:
                bm = d
                break
    bm = min(bm, M)
    assert M % bm == 0, (M, bm)
    out = pl.pallas_call(
        _kernel2d,
        grid=(M // bm,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((bm, Cmid), lambda i: (i, 0)),
            pl.BlockSpec((bm, Cin), lambda i: (i, 0)),
            pl.BlockSpec((Cmid, Cout), lambda i: (0, 0)),
            pl.BlockSpec((Cin, Cout), lambda i: (0, 0)),
            pl.BlockSpec((1, Cout), lambda i: (0, 0)),
            pl.BlockSpec((1, Cout), lambda i: (0, 0)),
            pl.BlockSpec((1, Cout), lambda i: (0, 0)),
            pl.BlockSpec((1, Cout), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, Cout), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((M, Cout), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            # a tight cap, NOT the blanket 100MB the other kernels use: the
            # vmem limit is a scoped reservation the XLA scheduler honors
            # around the custom call — round-2 traces showed neighboring
            # fusions losing their S(1) VMEM residency (stem +319us,
            # layer1_1 +411us/step) when kernels claim 100MB.
            vmem_limit_bytes=vmem_mb * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * Cout * (Cmid + Cin),
            bytes_accessed=M * (Cmid + Cin + Cout)
            + (Cmid + Cin) * Cout,
            transcendentals=0),
        interpret=interpret,
    )(scalars, b_q, xd_q, w3, wd, a3, b3, ad, bd)
    return out


def proj_coeffs(c3: Dict[str, Array], down: Dict[str, Array],
                next_grid: Tuple[Array, ...]) -> Dict[str, Array]:
    """Folded coefficients for qproj (qops.epilogue_coeffs both branches).

    conv3's coefficients fold the requant (affine ``next_grid``) and the
    relu merge; the downsample branch keeps plain dequant coefficients and
    rides in through C = 1/next_scale, mirroring the XLA f32-residual path.
    """
    row = lambda v: jnp.asarray(v, jnp.float32).reshape(1, -1)
    co3, _ = qops.epilogue_coeffs(
        act_scale=c3["act_scale"], act_zp=c3["act_zp"],
        w_scale=c3["w_scale"], colsum=c3["colsum"], bias=c3["bias"],
        requant_scale=next_grid[0], requant_zp=next_grid[1], relu=True,
        res_f32=True)
    cod, _ = qops.epilogue_coeffs(
        act_scale=down["act_scale"], act_zp=down["act_zp"],
        w_scale=down["w_scale"], colsum=down["colsum"], bias=down["bias"])
    scal = jnp.stack([co3.lo, co3.C]).reshape(1, 2)
    return dict(scalars=scal, a3=row(co3.A), b3=row(co3.B),
                ad=row(cod.A), bd=row(cod.B))

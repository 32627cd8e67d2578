"""Pallas TPU kernel: a CHAINED run of int8 MobileNet inverted residuals.

MobileNetV2's e2e ceiling is XLA fusion overhead, not kernel math: the
round-2 trace (BASELINE.md) has the flat engine at 33% of its per-layer
ideal with inverted-residual fusions running at 150-390 GB/s effective.
Per-op Pallas injection was measured OFF the table (custom-call scoped-VMEM
residency break), but the round-2 findings leave exactly one untried shape
— the same one as qstage (qtpu.ops.pallas.qstage) for ResNet: run EVERY
consecutive identity inverted residual of a resolution stage in ONE kernel,
entirely in the flattened 2-D (B*H*W, C) layout.

The fit is arguably better than ResNet's:

* the 3x3 **depthwise** conv in row-major 2-D layout is nine row-shifted
  **elementwise** multiplies by a per-channel tap row — pure VPU work
  (measured: chained elementwise VPU ops are effectively free), no MXU
  serialization and no layout casts at all;
* expand/project are plain 2-D GEMMs (the zero-cast competitive shape);
* chaining amortizes the custom-call boundary over the whole run and keeps
  the (rows, E) expanded activations in VMEM — the XLA path round-trips
  them through HBM at 6x the block's input bytes.

Epilogues use the folded A*acc+B form (qops.epilogue_coeffs) with relu6
folded into the ``hi`` clip, so outputs stay bit-identical to the flat
engine's XLA sequence (tests/test_pallas_qivr.py asserts this in interpret
mode; scripts/chip_qivr_bench.py measures on hardware).

Geometry contract: identical to qstage — each grid step processes WHOLE
images (mb = k*H*W rows) so the image-edge row masks stay image-aligned;
affine activation grids only; every chained block is an identity inverted
residual (stride 1, cin == cout, expand present).
"""
from __future__ import annotations

import functools
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qtpu.ops import qops
from qtpu.ops.pallas.qstage import _auto_k, _edge_masks

Array = jax.Array


def _kernel(scal_ref, x_ref, w1_ref, wd_ref, w3_ref,
            a1_ref, b1_ref, a2_ref, b2_ref, a3_ref, b3_ref,
            out_ref, pad_ref, *, H: int, W: int, NBLK: int):
    mb = x_ref.shape[0]
    OFF = W + 1                       # max |row shift| of a 3x3 tap
    hmask, wmask = _edge_masks(mb, H, W)

    x = x_ref[:]
    for blk in range(NBLK):
        lo1 = scal_ref[blk, 0]
        hi1 = scal_ref[blk, 1]
        lo2 = scal_ref[blk, 2]
        hi2 = scal_ref[blk, 3]
        lo3 = scal_ref[blk, 4]
        hi3 = scal_ref[blk, 5]
        c_res = scal_ref[blk, 6]
        zp_dw = scal_ref[blk, 7]

        # ---- expand (1x1): (mb, C) @ (C, E), relu6 folded in hi1 ----
        acc1 = jax.lax.dot_general(x, w1_ref[blk], (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)
        t1 = acc1.astype(jnp.float32) * a1_ref[blk:blk + 1] + \
            b1_ref[blk:blk + 1]
        a = (jnp.clip(jnp.round(t1), lo1, hi1) - 128.0).astype(jnp.int8)

        # ---- depthwise 3x3 SAME: nine row-shifted VPU multiplies ----
        zp_i8 = zp_dw.astype(jnp.int8)
        pad_ref[:OFF] = jnp.full_like(pad_ref[:OFF], zp_i8)
        pad_ref[OFF + mb:] = jnp.full_like(pad_ref[OFF + mb:], zp_i8)
        pad_ref[OFF:OFF + mb] = a
        acc2 = None
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                off = dy * W + dx
                t = (dy + 1) * 3 + (dx + 1)
                xs = pad_ref[OFF + off:OFF + off + mb]
                valid = None
                for m in (hmask[dy], wmask[dx]):
                    if m is not None:
                        valid = m if valid is None else jnp.logical_and(
                            valid, m)
                if valid is not None:
                    xs = jnp.where(valid, xs, zp_i8)
                tap = xs.astype(jnp.int32) * wd_ref[blk * 9 + t:
                                                    blk * 9 + t + 1
                                                    ].astype(jnp.int32)
                acc2 = tap if acc2 is None else acc2 + tap
        t2 = acc2.astype(jnp.float32) * a2_ref[blk:blk + 1] + \
            b2_ref[blk:blk + 1]
        b = (jnp.clip(jnp.round(t2), lo2, hi2) - 128.0).astype(jnp.int8)

        # ---- project (1x1) + int8 residual + requant (no relu) ----
        acc3 = jax.lax.dot_general(b, w3_ref[blk], (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)
        t3 = acc3.astype(jnp.float32) * a3_ref[blk:blk + 1] + \
            b3_ref[blk:blk + 1]
        t3 = t3 + x.astype(jnp.float32) * c_res
        x = (jnp.clip(jnp.round(t3), lo3, hi3) - 128.0).astype(jnp.int8)
    out_ref[:] = x


@functools.partial(jax.jit,
                   static_argnames=("h", "w", "k", "interpret", "vmem_mb"))
def qivr_fused(x_q: Array, *, w1: Array, wd: Array, w3: Array,
               scalars: Array, a1: Array, b1: Array, a2: Array, b2: Array,
               a3: Array, b3: Array, h: int, w: int, k: int = 0,
               interpret: bool = False, vmem_mb: int = 96) -> Array:
    """Chained identity inverted residuals on flattened int8 codes.

    x_q: (B*h*w, C) int8 on block 0's expand grid (row-major NHWC rows).
    Stacked weights: w1 (N, C, E) expand, wd (N*9, E) depthwise tap rows in
    (dy, dx) row-major order, w3 (N, E, C) project, all int8.  ``scalars``
    (N, 8) f32 and the (N, E)/(N, C) coefficient rows come from
    :func:`ivr_coeffs`.  ``k`` = images per grid step (0 = auto).  Returns
    (B*h*w, C) int8 codes on the next consumer's grid.
    """
    M, C = x_q.shape
    NBLK, _, E = w1.shape
    img = h * w
    B = M // img
    assert M == B * img, (M, h, w)
    if not k:
        # whole images per step: the (mb, E) int32/f32 temporaries dominate
        # (~12 bytes/row/E-lane over ~3 live temps) under vmem_mb.
        k = _auto_k(B, img, 12 * E, vmem_mb)
    k = min(k, B)
    assert B % k == 0, (B, k)
    mb = k * img
    assert interpret or mb == M or mb % 8 == 0, (
        f"no viable images-per-step tiling: B={B}, h*w={img}")
    out = pl.pallas_call(
        functools.partial(_kernel, H=h, W=w, NBLK=NBLK),
        grid=(M // mb,),
        in_specs=[
            pl.BlockSpec((NBLK, 8), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((mb, C), lambda i: (i, 0)),
            pl.BlockSpec((NBLK, C, E), lambda i: (0, 0, 0)),
            pl.BlockSpec((NBLK * 9, E), lambda i: (0, 0)),
            pl.BlockSpec((NBLK, E, C), lambda i: (0, 0, 0)),
            pl.BlockSpec((NBLK, E), lambda i: (0, 0)),
            pl.BlockSpec((NBLK, E), lambda i: (0, 0)),
            pl.BlockSpec((NBLK, E), lambda i: (0, 0)),
            pl.BlockSpec((NBLK, E), lambda i: (0, 0)),
            pl.BlockSpec((NBLK, C), lambda i: (0, 0)),
            pl.BlockSpec((NBLK, C), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((mb, C), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((M, C), jnp.int8),
        scratch_shapes=[pltpu.VMEM((mb + 2 * (w + 1), E), jnp.int8)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=vmem_mb * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * NBLK * E * (2 * C + 9),
            bytes_accessed=2 * M * C + NBLK * E * (2 * C + 9),
            transcendentals=0),
        interpret=interpret,
    )(scalars, x_q, w1, wd, w3, a1, b1, a2, b2, a3, b3)
    return out


def ivr_coeffs(blocks: Sequence[Tuple[Dict[str, Array], Dict[str, Array],
                                      Dict[str, Array]]],
               next_grid: Tuple[Array, ...],
               act_max: float = 6.0) -> Dict[str, Array]:
    """Stacked folded coefficients for a chain of identity inverted residuals.

    ``blocks``: [(expand, dw, project), ...] frozen nodes in order; block
    i's output requantizes onto block i+1's expand grid, the last onto
    ``next_grid``.  relu6 (``act_max``) folds into the hi clips of the
    expand and depthwise stages; the project stage has no relu (linear
    bottleneck).  All grids must be affine.
    """
    outs: Dict[str, List[Array]] = {key: [] for key in
                                    ("scalars", "a1", "b1", "a2", "b2",
                                     "a3", "b3")}
    row = lambda v: jnp.asarray(v, jnp.float32).reshape(1, -1)
    for i, (c1, c2, c3) in enumerate(blocks):
        if i + 1 < len(blocks):
            tgt = (blocks[i + 1][0]["act_scale"], blocks[i + 1][0]["act_zp"])
        else:
            tgt = next_grid
        co1, _ = qops.epilogue_coeffs(
            act_scale=c1["act_scale"], act_zp=c1["act_zp"],
            w_scale=c1["w_scale"], colsum=c1["colsum"], bias=c1["bias"],
            requant_scale=c2["act_scale"], requant_zp=c2["act_zp"],
            relu=True, act_max=act_max)
        co2, _ = qops.epilogue_coeffs(
            act_scale=c2["act_scale"], act_zp=c2["act_zp"],
            w_scale=c2["w_scale"], colsum=c2["colsum"], bias=c2["bias"],
            requant_scale=c3["act_scale"], requant_zp=c3["act_zp"],
            relu=True, act_max=act_max)
        co3, _ = qops.epilogue_coeffs(
            act_scale=c3["act_scale"], act_zp=c3["act_zp"],
            w_scale=c3["w_scale"], colsum=c3["colsum"], bias=c3["bias"],
            requant_scale=tgt[0], requant_zp=tgt[1], relu=False,
            res_scale=c1["act_scale"], res_zp=c1["act_zp"])
        zpa_s = jnp.asarray(c2["act_zp"], jnp.float32)
        scal = jnp.stack([co1.lo, co1.hi, co2.lo, co2.hi, co3.lo, co3.hi,
                          co3.C, zpa_s.reshape(())]).reshape(1, 8)
        outs["scalars"].append(scal)
        outs["a1"].append(row(co1.A))
        outs["b1"].append(row(co1.B))
        outs["a2"].append(row(co2.A))
        outs["b2"].append(row(co2.B))
        outs["a3"].append(row(co3.A))
        outs["b3"].append(row(co3.B))
    return {key: jnp.concatenate(v, axis=0) for key, v in outs.items()}


def stack_ivr_weights(blocks) -> Dict[str, Array]:
    """Stacked int8 weights for :func:`qivr_fused` from frozen nodes.

    Depthwise kernels are (3, 3, 1, E) HWIO with groups=E; tap (dy, dx)
    becomes row ``blk*9 + (dy+1)*3 + (dx+1)`` of the (N*9, E) tap matrix.
    """
    from qtpu.serve.fused_ops import unpacked_kernel

    c = unpacked_kernel(blocks[0][0]).shape[-2]
    e = unpacked_kernel(blocks[0][0]).shape[-1]
    return dict(
        w1=jnp.stack([unpacked_kernel(c1).reshape(c, e)
                      for c1, _, _ in blocks]),
        wd=jnp.concatenate([unpacked_kernel(c2).reshape(9, e)
                            for _, c2, _ in blocks]),
        w3=jnp.stack([unpacked_kernel(c3).reshape(e, c)
                      for _, _, c3 in blocks]))

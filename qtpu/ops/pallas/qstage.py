"""Pallas TPU kernel: a CHAINED run of int8 identity bottlenecks, pure 2-D.

Round-2 established two measured facts (BASELINE.md round-2 findings):

1. any single Pallas custom call inside the XLA engine breaks scoped-VMEM
   activation residency around it and costs more e2e than per-op kernels
   win back (scripts/chip_qproj_ab.py);
2. every 3-D-blocked conv-style kernel (qconv/qblock/qtail) pays Mosaic
   (bb, H, W*C) <-> (rows, C) vector relayouts and loses 2-5x, while the
   zero-cast 2-D GEMM forms (qmatmul, qproj2d) are the competitive shapes.

This kernel is the shape both findings point at and round 2 never tried:
run EVERY consecutive identity bottleneck of a ResNet stage in ONE kernel,
entirely in the flattened 2-D (B*H*W, C) layout.

* Chaining amortizes the custom-call boundary penalty over N blocks and
  removes the inter-block HBM round trips: the only HBM traffic is one
  int8 read of the chain input, the stacked weights (VMEM-resident for
  the whole grid), and one int8 write of the chain output.
* The 3x3 conv never materializes a 3-D view: in row-major (b, h, w)
  flattening, tap (dy, dx) of output row r is input row r + dy*W + dx, so
  conv2 is nine row-shifted (rows, Cmid) @ (Cmid, Cmid) GEMMs.  Shifts are
  static sublane slices of a zp-padded 2-D VMEM scratch; image-edge taps
  (h or w out of range) are remapped to the zero-point code with an
  iota-derived row mask, reproducing XLA's SAME zp-padding bit-exactly.
  Rows of different images never mix: any cross-image row the shift could
  touch is exactly a masked (out-of-image) tap.

Epilogues use the folded A*acc+B form (qops.epilogue_coeffs), so outputs
stay bit-identical to the engine's XLA sequence (tests/test_pallas_qstage.py
asserts this in interpret mode; scripts/chip_qstage_bench.py on hardware).

Geometry contract: each grid step processes WHOLE images (mb = k*H*W rows)
so the row masks are image-aligned.  Affine activation grids only (the
engine dispatch guards this, same rule as qblock/qtail).
"""
from __future__ import annotations

import functools
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qtpu.ops import qops

Array = jax.Array


def _edge_masks(mb: int, H: int, W: int):
    """Image-edge row masks for the row-shifted 3x3 taps (shared helpers)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (mb, 1), 0)
    hh = (r // W) % H
    ww = r - (r // W) * W
    hmask = {-1: hh >= 1, 0: None, 1: hh < H - 1}
    wmask = {-1: ww >= 1, 0: None, 1: ww < W - 1}
    return hmask, wmask


def _auto_k(B: int, img: int, row_bytes: int, vmem_mb: int) -> int:
    """Images-per-step tiling shared by qstage/qstage_proj/qivr.

    Doubles k while the (k·img, C) block fits the VMEM soft budget
    (``row_bytes`` per row over ~3 live temporaries) and the row count
    stays MXU-friendly; then keeps doubling past the soft cap if needed to
    satisfy the Mosaic block constraint (a (mb, C) block needs mb % 8 == 0
    unless it covers the whole array, grid = 1)."""
    cap = max(1, (vmem_mb * 2 ** 20 // 3) // (row_bytes * img))
    k = 1
    while k * 2 <= min(B, cap) and B % (k * 2) == 0 and \
            (k * 2) * img <= 4096:
        k *= 2
    while k < B and (k * img) % 8 and B % (k * 2) == 0:
        k *= 2
    return min(k, B)


def _conv3x3(a, w2_ref, base: int, pad_ref, hmask, wmask, zp_i8, W: int):
    """Nine row-shifted GEMMs: 3x3 SAME conv on flattened (mb, C) rows.

    ``a`` int8 (mb, Cmid); taps are w2_ref[base + t] in (dy, dx) row-major
    order; image-edge taps remapped to the zero-point code via the masks.
    Returns the int32 accumulator (mb, Cout_of_w2).
    """
    mb = a.shape[0]
    OFF = W + 1
    pad_ref[:OFF] = jnp.full_like(pad_ref[:OFF], zp_i8)
    pad_ref[OFF + mb:] = jnp.full_like(pad_ref[OFF + mb:], zp_i8)
    pad_ref[OFF:OFF + mb] = a
    acc = None
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            off = dy * W + dx
            t = (dy + 1) * 3 + (dx + 1)
            xs = pad_ref[OFF + off:OFF + off + mb]
            valid = None
            for m in (hmask[dy], wmask[dx]):
                if m is not None:
                    valid = m if valid is None else jnp.logical_and(valid, m)
            if valid is not None:
                xs = jnp.where(valid, xs, zp_i8)
            tap = jax.lax.dot_general(xs, w2_ref[base + t],
                                      (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            acc = tap if acc is None else acc + tap
    return acc


def _identity_chain(x, scal_ref, w1_ref, w2_ref, w3_ref,
                    a1_ref, b1_ref, a2_ref, b2_ref, a3_ref, b3_ref,
                    pad_ref, hmask, wmask, NBLK: int, W: int):
    """NBLK chained identity bottlenecks on int8 codes ``x`` (mb, Cin)."""
    for blk in range(NBLK):
        lo1 = scal_ref[blk, 0]
        lo2 = scal_ref[blk, 1]
        lo3 = scal_ref[blk, 2]
        c_res = scal_ref[blk, 3]
        zp2 = scal_ref[blk, 4]

        # ---- conv1 (1x1): (mb, Cin) @ (Cin, Cmid), folded requant ----
        acc1 = jax.lax.dot_general(x, w1_ref[blk], (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)
        t1 = acc1.astype(jnp.float32) * a1_ref[blk:blk + 1] + \
            b1_ref[blk:blk + 1]
        a = (jnp.clip(jnp.round(t1), lo1, 255.0) - 128.0).astype(jnp.int8)

        # ---- conv2 (3x3 SAME): nine row-shifted GEMMs on the 2-D scratch --
        acc2 = _conv3x3(a, w2_ref, blk * 9, pad_ref, hmask, wmask,
                        zp2.astype(jnp.int8), W)
        t2 = acc2.astype(jnp.float32) * a2_ref[blk:blk + 1] + \
            b2_ref[blk:blk + 1]
        b = (jnp.clip(jnp.round(t2), lo2, 255.0) - 128.0).astype(jnp.int8)

        # ---- conv3 (1x1) + int8 residual + relu + requant ----
        acc3 = jax.lax.dot_general(b, w3_ref[blk], (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)
        t3 = acc3.astype(jnp.float32) * a3_ref[blk:blk + 1] + \
            b3_ref[blk:blk + 1]
        t3 = t3 + x.astype(jnp.float32) * c_res
        x = (jnp.clip(jnp.round(t3), lo3, 255.0) - 128.0).astype(jnp.int8)
    return x


def _kernel(scal_ref, x_ref, w1_ref, w2_ref, w3_ref,
            a1_ref, b1_ref, a2_ref, b2_ref, a3_ref, b3_ref,
            out_ref, pad_ref, *, H: int, W: int, NBLK: int):
    mb = x_ref.shape[0]
    # Image-edge row masks, shared by every block in the chain.
    hmask, wmask = _edge_masks(mb, H, W)
    out_ref[:] = _identity_chain(
        x_ref[:], scal_ref, w1_ref, w2_ref, w3_ref, a1_ref, b1_ref,
        a2_ref, b2_ref, a3_ref, b3_ref, pad_ref, hmask, wmask, NBLK, W)


@functools.partial(jax.jit,
                   static_argnames=("h", "w", "k", "interpret", "vmem_mb"))
def qstage_fused(x_q: Array, *, w1: Array, w2: Array, w3: Array,
                 scalars: Array, a1: Array, b1: Array, a2: Array, b2: Array,
                 a3: Array, b3: Array, h: int, w: int, k: int = 0,
                 interpret: bool = False, vmem_mb: int = 96) -> Array:
    """Chained identity bottlenecks on flattened int8 codes.

    x_q: (B*h*w, Cin) int8 on block 0's conv1 grid (row-major NHWC rows —
    the caller's reshape from NHWC is a free byte-identity).  Stacked
    weights: w1 (N, Cin, Cmid), w2 (N*9, Cmid, Cmid) in (dy, dx) row-major
    tap order, w3 (N, Cmid, Cin), all int8.  ``scalars`` (N, 5) f32 and the
    (N, C) coefficient rows come from :func:`stage_coeffs`.  ``k`` = images
    per grid step (0 → auto).  Returns (B*h*w, Cin) int8 codes on the
    next consumer's grid.
    """
    M, Cin = x_q.shape
    NBLK, _, Cmid = w1.shape
    img = h * w
    B = M // img
    assert M == B * img, (M, h, w)
    if not k:
        # whole images per step: enough rows to fill the MXU, bounded by
        # the int32/f32 temporaries (~16 bytes/row/Cin-lane) under vmem_mb.
        k = _auto_k(B, img, 16 * Cin, vmem_mb)
    k = min(k, B)
    assert B % k == 0, (B, k)
    mb = k * img
    assert interpret or mb == M or mb % 8 == 0, (
        f"no viable images-per-step tiling: B={B}, h*w={img}")
    out = pl.pallas_call(
        functools.partial(_kernel, H=h, W=w, NBLK=NBLK),
        grid=(M // mb,),
        in_specs=[
            pl.BlockSpec((NBLK, 5), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((mb, Cin), lambda i: (i, 0)),
            pl.BlockSpec((NBLK, Cin, Cmid), lambda i: (0, 0, 0)),
            pl.BlockSpec((NBLK * 9, Cmid, Cmid), lambda i: (0, 0, 0)),
            pl.BlockSpec((NBLK, Cmid, Cin), lambda i: (0, 0, 0)),
            pl.BlockSpec((NBLK, Cmid), lambda i: (0, 0)),
            pl.BlockSpec((NBLK, Cmid), lambda i: (0, 0)),
            pl.BlockSpec((NBLK, Cmid), lambda i: (0, 0)),
            pl.BlockSpec((NBLK, Cmid), lambda i: (0, 0)),
            pl.BlockSpec((NBLK, Cin), lambda i: (0, 0)),
            pl.BlockSpec((NBLK, Cin), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((mb, Cin), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((M, Cin), jnp.int8),
        scratch_shapes=[pltpu.VMEM((mb + 2 * (w + 1), Cmid), jnp.int8)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=vmem_mb * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * NBLK * Cmid * (2 * Cin + 9 * Cmid),
            bytes_accessed=2 * M * Cin
            + NBLK * Cmid * (2 * Cin + 9 * Cmid),
            transcendentals=0),
        interpret=interpret,
    )(scalars, x_q, w1, w2, w3, a1, b1, a2, b2, a3, b3)
    return out


def _kernel_proj(pscal_ref, scal_ref, x_ref,
                 wp1_ref, wp2_ref, wp3_ref, wd_ref,
                 pa1_ref, pb1_ref, pa2_ref, pb2_ref, pa3_ref, pb3_ref,
                 pda_ref, pdb_ref,
                 w1_ref, w2_ref, w3_ref,
                 a1_ref, b1_ref, a2_ref, b2_ref, a3_ref, b3_ref,
                 out_ref, padp_ref, pad_ref, *, H: int, W: int, NBLK: int):
    """Stride-1 projection bottleneck, then the NBLK identity chain.

    The projection epilogue mirrors qproj exactly (downsample branch
    dequantized on its own coefficients, folded in via C = 1/next_scale)
    so the whole stage stays bit-identical to the engine's XLA sequence.
    """
    mb = x_ref.shape[0]
    hmask, wmask = _edge_masks(mb, H, W)
    lo1p = pscal_ref[0, 0]
    lo2p = pscal_ref[0, 1]
    zp2p = pscal_ref[0, 2]
    lo3p = pscal_ref[0, 3]
    c_inv = pscal_ref[0, 4]

    x0 = x_ref[:]
    # ---- proj conv1 (1x1) ----
    acc1 = jax.lax.dot_general(x0, wp1_ref[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    t1 = acc1.astype(jnp.float32) * pa1_ref[:] + pb1_ref[:]
    a = (jnp.clip(jnp.round(t1), lo1p, 255.0) - 128.0).astype(jnp.int8)
    # ---- proj conv2 (3x3 SAME, stride 1) ----
    acc2 = _conv3x3(a, wp2_ref, 0, padp_ref, hmask, wmask,
                    zp2p.astype(jnp.int8), W)
    t2 = acc2.astype(jnp.float32) * pa2_ref[:] + pb2_ref[:]
    b = (jnp.clip(jnp.round(t2), lo2p, 255.0) - 128.0).astype(jnp.int8)
    # ---- proj conv3 + downsample (two GEMMs, qproj epilogue order) ----
    acc3 = jax.lax.dot_general(b, wp3_ref[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    accd = jax.lax.dot_general(x0, wd_ref[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    td = accd.astype(jnp.float32) * pda_ref[:] + pdb_ref[:]
    t3 = acc3.astype(jnp.float32) * pa3_ref[:] + pb3_ref[:] + td * c_inv
    x = (jnp.clip(jnp.round(t3), lo3p, 255.0) - 128.0).astype(jnp.int8)

    out_ref[:] = _identity_chain(
        x, scal_ref, w1_ref, w2_ref, w3_ref, a1_ref, b1_ref,
        a2_ref, b2_ref, a3_ref, b3_ref, pad_ref, hmask, wmask, NBLK, W)


@functools.partial(jax.jit,
                   static_argnames=("h", "w", "k", "interpret", "vmem_mb"))
def qstage_proj_fused(x_q: Array, *, wp1: Array, wp2: Array, wp3: Array,
                      wd: Array, pscal: Array, pa1: Array, pb1: Array,
                      pa2: Array, pb2: Array, pa3: Array, pb3: Array,
                      pda: Array, pdb: Array,
                      w1: Array, w2: Array, w3: Array, scalars: Array,
                      a1: Array, b1: Array, a2: Array, b2: Array,
                      a3: Array, b3: Array, h: int, w: int, k: int = 0,
                      interpret: bool = False, vmem_mb: int = 96) -> Array:
    """A WHOLE stage — stride-1 projection block + identity chain — fused.

    x_q: (B*h*w, Cp) int8 on the projection block's conv1 grid.  Projection
    weights: wp1 (Cp, Cm), wp2 (9, Cm, Cm), wp3 (Cm, Co), wd (Cp, Co); chain
    stacks as in :func:`qstage_fused` with Cin = Co.  Coefficients from
    :func:`proj_stage_coeffs`.  Only valid for stride-1 projection stages
    (ResNet layer1); strided stages keep the XLA projection + qstage chain.
    Returns (B*h*w, Co) int8 codes on the next consumer's grid.
    """
    M, Cp = x_q.shape
    Cm = wp1.shape[1]
    Co = wp3.shape[1]
    NBLK, _, Cmid = w1.shape
    img = h * w
    B = M // img
    assert M == B * img, (M, h, w)
    if not k:
        k = _auto_k(B, img, 16 * max(Cp, Co), vmem_mb)
    k = min(k, B)
    assert B % k == 0, (B, k)
    mb = k * img
    assert interpret or mb == M or mb % 8 == 0, (
        f"no viable images-per-step tiling: B={B}, h*w={img}")
    row = lambda c: pl.BlockSpec((1, c), lambda i: (0, 0))
    out = pl.pallas_call(
        functools.partial(_kernel_proj, H=h, W=w, NBLK=NBLK),
        grid=(M // mb,),
        in_specs=[
            pl.BlockSpec((1, 5), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((NBLK, 5), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((mb, Cp), lambda i: (i, 0)),
            pl.BlockSpec((Cp, Cm), lambda i: (0, 0)),
            pl.BlockSpec((9, Cm, Cm), lambda i: (0, 0, 0)),
            pl.BlockSpec((Cm, Co), lambda i: (0, 0)),
            pl.BlockSpec((Cp, Co), lambda i: (0, 0)),
            row(Cm), row(Cm), row(Cm), row(Cm),
            row(Co), row(Co), row(Co), row(Co),
            pl.BlockSpec((NBLK, Co, Cmid), lambda i: (0, 0, 0)),
            pl.BlockSpec((NBLK * 9, Cmid, Cmid), lambda i: (0, 0, 0)),
            pl.BlockSpec((NBLK, Cmid, Co), lambda i: (0, 0, 0)),
            pl.BlockSpec((NBLK, Cmid), lambda i: (0, 0)),
            pl.BlockSpec((NBLK, Cmid), lambda i: (0, 0)),
            pl.BlockSpec((NBLK, Cmid), lambda i: (0, 0)),
            pl.BlockSpec((NBLK, Cmid), lambda i: (0, 0)),
            pl.BlockSpec((NBLK, Co), lambda i: (0, 0)),
            pl.BlockSpec((NBLK, Co), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((mb, Co), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((M, Co), jnp.int8),
        scratch_shapes=[pltpu.VMEM((mb + 2 * (w + 1), Cm), jnp.int8),
                        pltpu.VMEM((mb + 2 * (w + 1), Cmid), jnp.int8)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=vmem_mb * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * (Cm * (Cp + 9 * Cm + Co) + Cp * Co
                           + NBLK * Cmid * (2 * Co + 9 * Cmid)),
            bytes_accessed=M * (Cp + Co)
            + Cm * (Cp + 9 * Cm + Co) + Cp * Co
            + NBLK * Cmid * (2 * Co + 9 * Cmid),
            transcendentals=0),
        interpret=interpret,
    )(pscal, scalars, x_q, wp1, wp2, wp3, wd,
      pa1, pb1, pa2, pb2, pa3, pb3, pda, pdb,
      w1, w2, w3, a1, b1, a2, b2, a3, b3)
    return out


def proj_stage_coeffs(proj: Tuple[Dict[str, Array], ...],
                      blocks: Sequence[Tuple[Dict[str, Array],
                                             Dict[str, Array],
                                             Dict[str, Array]]],
                      next_grid: Tuple[Array, ...]) -> Dict[str, Array]:
    """Folded coefficients for a full stage: projection block + chain.

    ``proj`` = (c1, c2, c3, down) frozen nodes of the stride-1 projection
    block; its output requantizes onto chain block 0's conv1 grid.  The
    conv3+downsample epilogue reuses qproj's proj_coeffs so the fused stage
    stays bit-identical to the engine's XLA projection path.
    """
    from qtpu.ops.pallas.qproj import proj_coeffs

    c1, c2, c3, down = proj
    row = lambda v: jnp.asarray(v, jnp.float32).reshape(1, -1)
    co1, _ = qops.epilogue_coeffs(
        act_scale=c1["act_scale"], act_zp=c1["act_zp"],
        w_scale=c1["w_scale"], colsum=c1["colsum"], bias=c1["bias"],
        requant_scale=c2["act_scale"], requant_zp=c2["act_zp"], relu=True)
    co2, _ = qops.epilogue_coeffs(
        act_scale=c2["act_scale"], act_zp=c2["act_zp"],
        w_scale=c2["w_scale"], colsum=c2["colsum"], bias=c2["bias"],
        requant_scale=c3["act_scale"], requant_zp=c3["act_zp"], relu=True)
    chain0 = (blocks[0][0]["act_scale"], blocks[0][0]["act_zp"])
    tail = proj_coeffs(c3, down, chain0)
    zpa_s = jnp.asarray(c2["act_zp"], jnp.float32)
    pscal = jnp.stack([co1.lo, co2.lo, zpa_s.reshape(()),
                       tail["scalars"][0, 0],
                       tail["scalars"][0, 1]]).reshape(1, 5)
    return dict(pscal=pscal, pa1=row(co1.A), pb1=row(co1.B),
                pa2=row(co2.A), pb2=row(co2.B),
                pa3=tail["a3"], pb3=tail["b3"],
                pda=tail["ad"], pdb=tail["bd"],
                **stage_coeffs(blocks, next_grid))


def stage_coeffs(blocks: Sequence[Tuple[Dict[str, Array], Dict[str, Array],
                                        Dict[str, Array]]],
                 next_grid: Tuple[Array, ...]) -> Dict[str, Array]:
    """Stacked folded coefficients for a chain of identity bottlenecks.

    ``blocks``: [(c1, c2, c3), ...] frozen nodes in stage order; block i's
    output requantizes onto block i+1's conv1 grid, the last onto
    ``next_grid``.  All grids must be affine (engine dispatch guards this).
    """
    from qtpu.ops.pallas.qblock import block_coeffs

    outs: Dict[str, List[Array]] = {key: [] for key in
                                    ("scalars", "a1", "b1", "a2", "b2",
                                     "a3", "b3")}
    for i, (c1, c2, c3) in enumerate(blocks):
        if i + 1 < len(blocks):
            tgt = (blocks[i + 1][0]["act_scale"], blocks[i + 1][0]["act_zp"])
        else:
            tgt = next_grid
        co = block_coeffs(c1, c2, c3, tgt)
        for key, v in co.items():
            outs[key].append(v)
    return {key: jnp.concatenate(v, axis=0) for key, v in outs.items()}

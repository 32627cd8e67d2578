"""Shared fused-layer primitives for the flat int8 engines.

Each op consumes a frozen ``qweights`` node (qtpu.transform.freeze layout) and
an int8 NHWC activation tensor, optionally fusing ReLU/relu6, an int8 or f32
residual, and requantization onto the consumer's calibrated affine grid.
``use_pallas=False`` routes through XLA (portable / CPU-testable; XLA fuses
the same epilogues elementwise); ``True`` uses the Pallas kernels where shapes
allow.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from qtpu.ops import fakequant as fq
from qtpu.ops import qops
from qtpu.ops.pallas.qmatmul import qmatmul_fused

Array = jax.Array
# (act_scale f32, act_zp int32 signed[, symmetric bool — static]).  The
# 2-tuple form is accepted everywhere and means affine.
Grid = Tuple[Array, ...]


def grid_of(node: Dict[str, Array]) -> Grid:
    """(scale, zp, symmetric) grid of a frozen node.

    ``symmetric`` is a *static* Python bool (read from the concrete act_sym
    leaf the SERVE module declared) so requantization dispatches to the same
    affine/symmetric path as the module path — codes then match bit-exactly
    for both grid kinds, not just affine ones.
    """
    sym = node.get("act_sym") if hasattr(node, "get") else None
    return node["act_scale"], node["act_zp"], (bool(sym) if sym is not None
                                               else False)


def grid_parts(grid: Optional[Grid]):
    """Unpack a 2- or 3-tuple grid into (scale, zp, symmetric)."""
    if grid is None:
        return None, None, False
    if len(grid) == 3:
        return grid
    return grid[0], grid[1], False


def unpacked_kernel(node: Dict[str, Array]) -> Array:
    """int8 weights of a frozen node, unpacking int4 nibbles if needed."""
    w = node["kernel_q"]
    if w.shape[-1] != node["colsum"].shape[0]:
        w = fq.unpack_int4(w, axis=-1)
    return w


def is_int4(node: Dict[str, Array]) -> bool:
    return node["kernel_q"].shape[-1] != node["colsum"].shape[0]


def best_tile(n: int, candidates=(1024, 512, 256, 128, 64, 32, 16, 8)) -> int:
    for c in candidates:
        if n % c == 0:
            return c
    return n


def lane_tile(n: int, candidates=(512, 256, 128)) -> int:
    """Tile for a LANE (minor) dimension: Mosaic requires lane blocks to be
    multiples of 128 or equal to the full dimension (e.g. Co=96 → 96)."""
    for c in candidates:
        if n % c == 0:
            return c
    return n


def dequant(x_q: Array, grid: Grid) -> Array:
    s, zp, _ = grid_parts(grid)
    return (x_q.astype(jnp.float32) - zp.astype(jnp.float32)) * s


def fold_bn_fp32(params: Dict, batch_stats: Dict, name: str,
                 bn_eps: float = 1e-5):
    """Eval-time BN fold of an EXCLUDED ConvBN's fp32 params → (W, b).

    Excluded layers (the reference's canonical first/last exclusion,
    SURVEY.md §1.2 R2) run fp32 inside the flat engines; their BN is folded
    once at build time with running stats — the same fold freeze() applies
    to quantized ConvBNs (qtpu/transform/freeze.py).
    """
    p = (params or {}).get(name)
    if p is None or "kernel" not in p:
        raise ValueError(f"layer {name} neither quantized nor in params")
    w = jnp.asarray(p["kernel"], jnp.float32)
    bn = (batch_stats or {}).get(name)
    if bn is not None and "mean" in bn:
        gamma = jnp.asarray(p["scale"], jnp.float32)
        sigma = jnp.sqrt(jnp.asarray(bn["var"], jnp.float32) + bn_eps)
        b = (jnp.asarray(p["bias"], jnp.float32)
             - gamma * jnp.asarray(bn["mean"], jnp.float32) / sigma)
        w = w * (gamma / sigma)
    else:
        b = jnp.asarray(p.get("bias", jnp.zeros((w.shape[-1],))), jnp.float32)
    return w, b


def fc_fp32_params(params: Dict):
    """(kernel, bias) of an EXCLUDED fp32 fc layer from the params tree."""
    p = (params or {}).get("fc")
    if p is None or "kernel" not in p:
        raise ValueError("fc neither quantized nor present in params")
    return (jnp.asarray(p["kernel"], jnp.float32),
            jnp.asarray(p.get("bias", jnp.zeros(p["kernel"].shape[-1])),
                        jnp.float32))


def u8_normalize_coeffs(mean, std, channels: int):
    """Per-channel (a, b) with ``(x_u8/255 - mean)/std == x_u8*a + b``.

    The on-device half of raw-uint8 ingest: raw 0-255 pixels cross the wire
    (4x less transfer than f32 — the measured request-latency bottleneck,
    BASELINE.md round-2/3) and are normalized on device in one fused
    elementwise op before the stem.  Same normalize convention as the
    host-side ``qtpu.data.native`` preprocessors.
    """
    import numpy as np

    mean = np.broadcast_to(np.asarray(mean, np.float32), (channels,))
    std = np.broadcast_to(np.asarray(std, np.float32), (channels,))
    return (jnp.asarray(1.0 / (255.0 * std), jnp.float32),
            jnp.asarray(-mean / std, jnp.float32))


def gemm_1x1(x_q: Array, node: Dict[str, Array], *, relu: bool = False,
             act_max: Optional[float] = None, requant: Optional[Grid] = None,
             out_dtype=jnp.float32, residual: Optional[Array] = None,
             res_grid: Optional[Grid] = None, use_pallas: bool = True,
             min_ci_pallas: int = 64, packed_int4: bool = False) -> Array:
    """1×1 conv as a fused GEMM over a frozen node.

    ``packed_int4``: for int4 nodes on the Pallas path, ship nibble-packed
    (K, N/2) weight blocks to VMEM and unpack inside the kernel — halves the
    weight HBM traffic.  Measured on-chip (scripts/chip_int4_unpack_bench,
    2026-08-17): 1.32x in the weight-bound regime (small M: K=512, N=2048,
    M=512), 0.9-0.95x when compute-bound (the unpack VPU work re-runs per
    M-tile) — so callers should enable it for latency-serving batch sizes.
    """
    B, H, W, Ci = x_q.shape
    w = unpacked_kernel(node)
    w = w.reshape(w.shape[-2:])
    Co = w.shape[-1]
    M = B * H * W
    rs, rz, rsym = grid_parts(requant)
    if (use_pallas and M % 32 == 0 and Co % 32 == 0 and Ci % 64 == 0
            and Ci >= min_ci_pallas):
        bn = lane_tile(Co)
        w_packed = (packed_int4 and is_int4(node) and (bn // 2) % 128 == 0
                    and Co % bn == 0)
        if w_packed:
            from qtpu.ops.pallas.qmatmul import pack_int4_halves
            w = pack_int4_halves(w, bn)
        res2 = residual.reshape(M, Co) if residual is not None else None
        res_s = res_grid[0] if res_grid is not None else None
        res_z = (res_grid[1].astype(jnp.float32)
                 if res_grid is not None else None)
        y = qmatmul_fused(
            x_q.reshape(M, Ci), w, act_scale=node["act_scale"],
            act_zp=node["act_zp"], w_scale=node["w_scale"],
            colsum=node["colsum"], bias=node["bias"], requant_scale=rs,
            # requant_zp=None selects the kernel's symmetric requant path
            # (round(y/s), clip ±127) — bit-matching quantize_act(sym).
            requant_zp=None if rsym else rz,
            relu=relu, act_max=act_max, residual=res2,
            res_scale=res_s, res_zp=res_z, bm=best_tile(M),
            bn=bn, bk=min(Ci, 4096),
            out_dtype=out_dtype, w_packed=w_packed)
        return y.reshape(B, H, W, Co)
    # XLA fallback: stay in NHWC via a 1x1 conv — reshaping to (M, C) forces
    # a physical relayout whenever C is not lane-aligned (all of MobileNet),
    # which measured 3x slower end-to-end than the conv form.  The epilogue
    # runs folded (qops.epilogue_coeffs): the round-2 trace showed the f32
    # epilogue chain, not the MXU, bounds every fusion in the flat engines.
    acc = qops.qconv2d(x_q, w.reshape(1, 1, Ci, Co), zp=node["act_zp"])
    res = residual.reshape(B, H, W, Co) if residual is not None else None
    res_int8 = res is not None and res.dtype == jnp.int8
    gs, gz, _ = grid_parts(res_grid) if res_int8 else (None, None, False)
    co, mode = qops.epilogue_coeffs(
        act_scale=node["act_scale"], act_zp=node["act_zp"],
        w_scale=node["w_scale"], colsum=node["colsum"], bias=node["bias"],
        requant_scale=rs, requant_zp=rz, requant_symmetric=rsym,
        relu=relu, act_max=act_max,
        res_scale=gs, res_zp=gz,
        res_f32=res is not None and not res_int8)
    return qops.apply_epilogue(
        acc, co, mode, residual=res,
        out_dtype=jnp.int8 if mode.requant else out_dtype)


def conv_xla(x_q: Array, node: Dict[str, Array], *, strides=(1, 1),
             groups: int = 1, relu: bool = False,
             act_max: Optional[float] = None,
             requant: Optional[Grid] = None,
             padding="SAME",
             dw_shifted: bool = False) -> Array:
    """K×K (optionally grouped/depthwise, strided) conv via XLA int8.

    Epilogue runs folded (see gemm_1x1 / qops.epilogue_coeffs).
    ``padding``: "SAME" or explicit ((lo,hi),(lo,hi)) pads — torch-geometry
    models (qtpu/data/import_torch.py) pad stride-2 convs symmetrically
    where SAME pads (0,1), so the flat engines pass the model's explicit
    pads through here.
    ``dw_shifted``: run a depthwise conv as shifted elementwise FMAs
    instead of the grouped-conv op (qops.qdepthwise_shifted — bit-exact,
    pure XLA, no custom call; a fusion-shape experiment for the measured
    grouped-conv bandwidth ceiling).
    """
    w = unpacked_kernel(node)
    if dw_shifted and groups > 1 and w.shape[2] == 1:
        acc = qops.qdepthwise_shifted(x_q, w, strides=strides,
                                      padding=padding, zp=node["act_zp"])
    else:
        acc = qops.qconv2d(x_q, w, strides=strides,
                           padding=padding, groups=groups, zp=node["act_zp"])
    rs, rz, rsym = grid_parts(requant)
    co, mode = qops.epilogue_coeffs(
        act_scale=node["act_scale"], act_zp=node["act_zp"],
        w_scale=node["w_scale"], colsum=node["colsum"], bias=node["bias"],
        requant_scale=rs, requant_zp=rz, requant_symmetric=rsym,
        relu=relu, act_max=act_max)
    return qops.apply_epilogue(acc, co, mode)

"""Integer execution ops for the serving path (XLA int8 → MXU).

These are the *real* quantized compute primitives used by ``QuantMode.SERVE``:
int8×int8→int32 matmul/conv with the dequantization epilogue fused by XLA.
On TPU, int8 contractions with ``preferred_element_type=jnp.int32`` lower onto
the MXU int8 path (2× the bf16 rate on v5e).  The Pallas kernels in
``qtpu.ops.pallas`` implement the same contracts with hand-tiled fusion; this
module is both the portable fallback and the numerical oracle the Pallas
kernels are tested against (SURVEY.md §4.2).

Affine-activation correctness notes (the classic integer-conv pitfalls):

* zero-point padding: a real 0 maps to ``q = zp``, so SAME conv padding must
  pad the integer tensor with ``zp``, not 0 — handled by explicit lax.pad.
* epilogue: y = s_x·s_w·(acc − zp_x·colsum(w)) + b, where colsum is the
  per-output-channel sum of integer weights (precomputed at freeze time).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from qtpu.utils import debug

Array = jax.Array


def same_pads(in_spatial: Sequence[int], window: Sequence[int],
              strides: Sequence[int]) -> Tuple[Tuple[int, int], ...]:
    """Explicit (lo, hi) pads reproducing XLA SAME padding."""
    pads = []
    for n, w, s in zip(in_spatial, window, strides):
        out = -(-n // s)
        total = max((out - 1) * s + w - n, 0)
        pads.append((total // 2, total - total // 2))
    return tuple(pads)


def resolve_and_pad(x_q: Array, window: Sequence[int],
                    strides: Sequence[int],
                    padding: Union[str, Sequence[Tuple[int, int]]],
                    zp: Optional[Array]) -> Array:
    """Resolve SAME/VALID/explicit padding and zero-point-pad ``x_q``.

    One definition (previously triplicated across qconv2d,
    qdepthwise_shifted and qconv2d_strided, where any non-SAME string —
    including typos — silently meant VALID).  Unknown strings raise.
    """
    if isinstance(padding, str):
        p = padding.upper()
        if p == "SAME":
            pads = same_pads(x_q.shape[1:3], window, strides)
        elif p == "VALID":
            pads = ((0, 0), (0, 0))
        else:
            raise ValueError(f"unknown padding {padding!r} "
                             "(use 'SAME', 'VALID', or explicit (lo,hi) pairs)")
    else:
        pads = tuple(padding)
    if any(p != (0, 0) for p in pads):
        pad_val = (jnp.zeros((), x_q.dtype) if zp is None
                   else zp.astype(x_q.dtype))
        x_q = jax.lax.pad(x_q, pad_val,
                          ((0, 0, 0), (*pads[0], 0), (*pads[1], 0), (0, 0, 0)))
    return x_q


def qconv2d(x_q: Array, w_q: Array, *, strides: Tuple[int, int] = (1, 1),
            padding: Union[str, Sequence[Tuple[int, int]]] = "SAME",
            groups: int = 1, zp: Optional[Array] = None) -> Array:
    """int8 NHWC × int8 HWIO → int32 NHWC convolution.

    ``zp`` (integer-valued scalar) is the activation zero-point used for
    padding; pass None for symmetric activations (pad with 0).
    """
    debug.check_int_inputs(x_q, w_q, what="qconv2d")
    x_q = resolve_and_pad(x_q, w_q.shape[:2], strides, padding, zp)
    return jax.lax.conv_general_dilated(
        x_q, w_q, window_strides=strides, padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.int32)


def qdepthwise_shifted(x_q: Array, w_q: Array, *,
                       strides: Tuple[int, int] = (1, 1),
                       padding: Union[str, Sequence[Tuple[int, int]]] = "SAME",
                       zp: Optional[Array] = None) -> Array:
    """Depthwise int8 conv as kh·kw shifted elementwise FMAs (no conv op).

    Bit-identical to ``qconv2d(..., groups=C)`` (int32 accumulation over the
    same taps).  Rationale: XLA's grouped-conv kernels run at 186-409 GB/s
    effective on MobileNet shapes (round-2/3 traces) while long elementwise
    chains run at HBM rate (scripts/chip_vpu_bench.py) — expressing the
    9-tap depthwise as strided-slice multiplies keeps the whole layer in
    XLA elementwise fusions with NO custom call (so no scoped-VMEM
    residency break, unlike the Pallas qdepthwise/qivr attempts).
    ``w_q``: HWIO with I==1, O==C (the grouped-conv kernel layout).
    """
    debug.check_int_inputs(x_q, w_q, what="qdepthwise_shifted")
    kh, kw, i_dim, c = w_q.shape
    assert i_dim == 1 and c == x_q.shape[-1], (w_q.shape, x_q.shape)
    x_q = resolve_and_pad(x_q, (kh, kw), strides, padding, zp)
    sh, sw = strides
    hp, wp = x_q.shape[1:3]
    ho, wo = (hp - kh) // sh + 1, (wp - kw) // sw + 1
    acc = None
    for dy in range(kh):
        for dx in range(kw):
            tap = jax.lax.slice(
                x_q, (0, dy, dx, 0),
                (x_q.shape[0], dy + (ho - 1) * sh + 1,
                 dx + (wo - 1) * sw + 1, c),
                (1, sh, sw, 1)).astype(jnp.int32)
            term = tap * w_q[dy, dx, 0, :].astype(jnp.int32)
            acc = term if acc is None else acc + term
    return acc


def qmatmul(x_q: Array, w_q: Array) -> Array:
    """int8 (…, K) × int8 (K, N) → int32 (…, N)."""
    debug.check_int_inputs(x_q, w_q, what="qmatmul")
    return jax.lax.dot_general(
        x_q, w_q, dimension_numbers=(((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


def quantize_act(x: Array, scale: Array, zp: Array, bits: int = 8,
                 symmetric: bool = False) -> Array:
    """fp32 → signed int8 storage on an affine grid with zero-point ``zp``.

    ``zp`` (int32 scalar) is on the signed grid (freeze shifts the unsigned
    calibration zero-point by −2^(bits−1)).  To bit-match the fake-quant
    simulation, the affine path rounds on the *unsigned* grid exactly as
    ``fakequant.fake_quant`` does — ``round(x/s + zp_u)`` — then shifts:
    fp32 rounding of ``x/s + 5`` vs ``x/s + 133`` can differ by one code at
    tie boundaries, which would otherwise make integer serving diverge from
    the calibrated simulation.
    """
    debug.check_quant_grid(scale, zp, what="quantize_act")
    qmax = (1 << (bits - 1)) - 1
    if symmetric:
        q = jnp.clip(jnp.round(x / scale), -qmax, qmax)
    else:
        offset = 1 << (bits - 1)
        zp_u = zp.astype(jnp.float32) + offset
        q = jnp.clip(jnp.round(x / scale + zp_u), 0, (1 << bits) - 1) - offset
    return q.astype(jnp.int8)


class EpilogueCoeffs(NamedTuple):
    """Folded per-channel epilogue coefficients (see :func:`epilogue_coeffs`).

    ``A``/``B`` are (N,) f32; ``C``/``lo``/``hi`` are scalar f32.  The static
    companion :class:`EpilogueMode` carries the Python-level flags.
    """
    A: Array
    B: Array
    C: Array
    lo: Array
    hi: Array


class EpilogueMode(NamedTuple):
    requant: bool          # True → int8 codes out; False → f32 out
    shift: float           # 128.0 affine / 0.0 symmetric (requant only)
    relu: bool             # f32-mode only (folded into lo when requant)
    act_max: Optional[float]   # f32-mode only (folded into hi when requant)


def epilogue_coeffs(*, act_scale: Array, act_zp: Array, w_scale: Array,
                    colsum: Array, bias: Optional[Array] = None,
                    requant_scale: Optional[Array] = None,
                    requant_zp: Optional[Array] = None,
                    requant_symmetric: bool = False,
                    relu: bool = False, act_max: Optional[float] = None,
                    res_scale: Optional[Array] = None,
                    res_zp: Optional[Array] = None,
                    res_f32: bool = False
                    ) -> Tuple[EpilogueCoeffs, EpilogueMode]:
    """Fold the dequant→(residual)→relu→requant chain into ≈half the VPU ops.

    Round-2 trace finding (qtpu.bench.tracing, B=128): every conv fusion in
    the flat engines is bound by the f32 *epilogue* element-wise chain, not
    the MXU or HBM — identity-block fusions sit at ~50% of their roofline
    with the MXU at 16-30%.  The sequential chain costs ~17 VPU ops/element;
    algebraically folding it into ``clip(round(acc·A + B [+ r·C]), lo, hi)``
    costs ~9.  This function is the single source of truth for the folding —
    the XLA paths (qtpu.serve.fused_ops), the module SERVE path, and the
    Pallas kernel wrappers all fold here so their outputs stay bit-identical
    to each other.

    Exactness notes (vs the sequential reference):

    * relu merges into the lower clip: ``round`` is monotone and the affine
      zero code ``zp_u`` is an exact integer, so
      ``round(max(y,0)/s + zp_u) == max(round(y/s + zp_u), zp_u)``.
    * ``act_max`` (relu6) merges into the upper clip the same way.
    * the fp32 rounding of ``acc·A + B`` differs from the sequential
      ``(acc − zp·colsum)·s_x·s_w + bias`` by ulps — codes at exact fp32 tie
      boundaries may move by one step.  All cross-path parity in this repo
      is therefore defined against *this* formula.

    ``requant_zp`` is the signed-grid int zero point; None + ``requant_scale``
    set means a symmetric grid.  ``res_scale``/``res_zp`` describe an int8
    residual's grid; ``res_f32=True`` marks an f32 residual instead.
    """
    n = colsum.shape[-1]
    A0 = jnp.asarray(act_scale, jnp.float32) * jnp.asarray(
        w_scale, jnp.float32)
    zc = (jnp.asarray(act_zp, jnp.int32) * jnp.asarray(colsum, jnp.int32)
          ).astype(jnp.float32)
    B0 = -A0 * zc
    if bias is not None:
        B0 = B0 + jnp.asarray(bias, jnp.float32)
    if requant_scale is None:
        C = jnp.float32(1.0)
        if res_scale is not None:
            C = jnp.asarray(res_scale, jnp.float32)
            if res_zp is not None:
                B0 = B0 - jnp.asarray(res_zp, jnp.float32) * C
        # broadcast_to: per-tensor (scalar) w_scale gives a scalar A
        co = EpilogueCoeffs(A=jnp.broadcast_to(A0, (n,)),
                            B=jnp.broadcast_to(B0, (n,)), C=C,
                            lo=jnp.float32(0), hi=jnp.float32(0))
        return co, EpilogueMode(False, 0.0, relu, act_max)
    inv = 1.0 / jnp.maximum(jnp.asarray(requant_scale, jnp.float32), 1e-12)
    A = A0 * inv
    B = B0 * inv
    if res_f32:
        C = inv
    elif res_scale is not None:
        C = jnp.asarray(res_scale, jnp.float32) * inv
        if res_zp is not None:
            B = B - jnp.asarray(res_zp, jnp.float32) * C
    else:
        C = jnp.float32(0.0)
    if requant_zp is not None and not requant_symmetric:
        zp_u = jnp.asarray(requant_zp, jnp.float32) + 128.0
        B = B + zp_u
        lo = zp_u if relu else jnp.float32(0.0)
        hi = jnp.float32(255.0)
        if act_max is not None:
            hi = jnp.minimum(hi, jnp.round(act_max * inv + zp_u))
        shift = 128.0
    else:
        lo = jnp.float32(0.0) if relu else jnp.float32(-127.0)
        hi = jnp.float32(127.0)
        if act_max is not None:
            hi = jnp.minimum(hi, jnp.round(act_max * inv))
        shift = 0.0
    co = EpilogueCoeffs(A=jnp.broadcast_to(A, (n,)),
                        B=jnp.broadcast_to(B, (n,)), C=C,
                        lo=jnp.asarray(lo, jnp.float32), hi=hi)
    return co, EpilogueMode(True, shift, relu, act_max)


def apply_epilogue(acc: Array, co: EpilogueCoeffs, mode: EpilogueMode,
                   residual: Optional[Array] = None,
                   out_dtype=None) -> Array:
    """Apply folded epilogue coefficients to an int32 accumulator.

    ``residual`` may be int8 codes (grid folded into ``co``) or f32.  With
    ``mode.requant`` the result is int8 codes; otherwise f32 (optionally
    relu/act_max-clipped).
    """
    t = acc.astype(jnp.float32) * co.A + co.B
    if residual is not None:
        t = t + residual.astype(jnp.float32) * co.C
    if mode.requant:
        q = jnp.clip(jnp.round(t), co.lo, co.hi) - mode.shift
        return q.astype(out_dtype or jnp.int8)
    if mode.relu:
        t = jnp.maximum(t, 0.0)
    if mode.act_max is not None:
        t = jnp.minimum(t, mode.act_max)
    return t if out_dtype is None else t.astype(out_dtype)


def dequant_epilogue(acc: Array, *, act_scale: Array, act_zp: Array,
                     w_scale: Array, colsum: Array,
                     bias: Optional[Array] = None) -> Array:
    """(acc int32, scales) → fp32 output.

    y[..., o] = act_scale·w_scale[o]·(acc[..., o] − act_zp·colsum[o]) + b[o]

    ``act_zp`` and ``colsum`` are int32 so the zero-point correction happens
    exactly in integer arithmetic before the float conversion.
    """
    corrected = acc - act_zp * colsum
    y = corrected.astype(jnp.float32) * (act_scale * w_scale)
    if bias is not None:
        y = y + bias
    return y

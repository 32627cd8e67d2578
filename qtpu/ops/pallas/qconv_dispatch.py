"""Strided int8 convs for the Pallas conv kernel: phase-split dispatch.

The static-tap Pallas conv kernel (qtpu.ops.pallas.qconv) is stride-1 only —
Mosaic rejects strided window slices.  A stride-2 K×K conv decomposes into
four stride-1 phase convolutions (VERDICT r1 item 2 / SURVEY.md §2.2 row 1):

    y(oh, ow) = Σ_{p,q ∈ {0,1}}  conv1x[ x[p::2, q::2],  w[p::2, q::2] ]

Each phase runs the Pallas kernel in ``raw_acc`` mode (int32 accumulator,
no epilogue); the four accumulators sum exactly, then ONE folded epilogue
(qops.epilogue_coeffs, full-kernel colsum) produces the output — bit-exact
vs the XLA strided-conv oracle (tests/test_qconv_dispatch.py).

Constraints inherited from the kernel: Ci must satisfy the Mosaic
(rows, Ci) window-cast rule (Ci % 128 == 0 compiled; any Ci in interpret
mode), so this covers the projection-block stride-2 3×3s (Cmid 128-512),
NOT the Ci=3 stem — the stem keeps the XLA path (chip_stem_bench2.py:
space-to-depth and bf16-MXU reformulations measured within 2% of the
direct XLA int8 conv; the stem is bound by its epilogue element count and
XLA's lane padding of tiny Ci, not by the contraction).

Performance status: NOT dispatched by the engines — the four-launch phase
split materializes int32 phase accumulators in HBM, and round-2 measurements
established that inserting Pallas custom calls into the XLA engine program
costs more in lost scoped-VMEM residency than local wins recover
(resnet_engine.py use_qproj note).  This module is the correctness-complete
strided Pallas path, closing qconv.py's dispatch contract.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from qtpu.ops import qops
from qtpu.ops.pallas.qconv import qconv2d_fused

Array = jax.Array


def qconv2d_strided(x_q: Array, w_q: Array, *, act_scale: Array,
                    act_zp: Array, w_scale: Array, colsum: Array,
                    bias: Optional[Array] = None,
                    requant_scale: Optional[Array] = None,
                    requant_zp: Optional[Array] = None,
                    strides: Tuple[int, int] = (2, 2),
                    padding="SAME", bb: int = 4,
                    out_dtype=jnp.float32, relu: bool = False,
                    act_max: Optional[float] = None,
                    interpret: bool = False) -> Array:
    """Strided int8 conv via phase-split stride-1 Pallas kernels.

    Same scalar conventions as ``qconv2d_fused``; ``padding`` is "SAME",
    "VALID", or explicit ((lo,hi),(lo,hi)).  Output matches
    ``qops.qconv2d(...)`` + folded epilogue bit-exactly.
    """
    sh, sw = strides
    assert (sh, sw) == (2, 2), "phase-split implemented for stride 2"
    B, H, W, Ci = x_q.shape
    KH, KW, _, Co = w_q.shape
    xp = qops.resolve_and_pad(x_q, (KH, KW), strides, padding,
                              jnp.asarray(act_zp))
    Hp, Wp = xp.shape[1:3]
    OH = (Hp - KH) // 2 + 1
    OW = (Wp - KW) // 2 + 1

    acc = None
    for p in range(min(2, KH)):
        for q in range(min(2, KW)):
            wpq = w_q[p::2, q::2]
            kh, kw = wpq.shape[:2]
            # phase slice sized so the VALID stride-1 conv yields (OH, OW)
            need_h, need_w = OH + kh - 1, OW + kw - 1
            xpq = xp[:, p:p + 2 * need_h:2, q:q + 2 * need_w:2, :]
            a = qconv2d_fused(
                xpq, wpq, act_scale=act_scale, act_zp=act_zp,
                w_scale=jnp.zeros((Co,), jnp.float32),
                colsum=jnp.zeros((Co,), jnp.int32), bb=bb,
                raw_acc=True, interpret=interpret)
            acc = a if acc is None else acc + a
    co, mode = qops.epilogue_coeffs(
        act_scale=act_scale, act_zp=act_zp, w_scale=w_scale, colsum=colsum,
        bias=bias, requant_scale=requant_scale, requant_zp=requant_zp,
        relu=relu, act_max=act_max)
    return qops.apply_epilogue(acc, co, mode,
                               out_dtype=jnp.int8 if mode.requant
                               else out_dtype)

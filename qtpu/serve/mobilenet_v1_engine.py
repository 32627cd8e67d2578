"""Hand-scheduled int8 MobileNet-v1 inference engine.

Flat int8-resident pipeline over frozen qweights — the v1 counterpart of
MobileNetV2Int8Engine (SURVEY.md §1.2 R6 lists MobileNet-v1 in the
reference's model-zoo targets; §2.2 requires the depthwise quant path).
v1 is a plain depthwise-separable stack (no residuals, plain relu):

* stem 3x3/s2, then 13 x (depthwise 3x3 + pointwise 1x1), pool, fc;
* depthwise via XLA int8 grouped conv (the measured dispatch — PARITY.md),
  relu+requant folded into the epilogue;
* activations stay int8 between layers on each consumer's calibrated grid;
  the final pointwise emits fp32 for the mean-pool -> fc quantize.

Block layout mirrors qtpu.models.mobilenet.MobileNetV1: stem, block{i} with
dw/pw children, fc.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from qtpu.bench.profile import annotate
from qtpu.nn.layers import BN_EPS
from qtpu.ops import qops
from qtpu.serve.fused_ops import (conv_xla, fc_fp32_params, fold_bn_fp32,
                                  gemm_1x1, grid_of, grid_parts,
                                  u8_normalize_coeffs, unpacked_kernel)

Array = jax.Array

# per-block strides — must match models/mobilenet.py MobileNetV1 cfg
V1_STRIDES = (1, 2, 1, 2, 1, 2, 1, 1, 1, 1, 1, 2, 1)


class MobileNetV1Int8Engine:
    """Flat int8 inference over frozen MobileNet-v1 qweights."""

    def __init__(self, variables: Dict[str, Any], num_classes: int,
                 use_pallas: bool = False, dw_shifted=False,
                 torch_pad: bool = False, stem_dtype=jnp.float32,
                 normalize=None):
        # torch_pad: torchvision geometry — explicit (1,1) pads on the
        # strided 3x3 stem/depthwise convs (see MobileNetV2Int8Engine).
        self.torch_pad = bool(torch_pad)
        self._pad3 = ((1, 1), (1, 1)) if torch_pad else "SAME"
        # use_pallas=False default for the same reason as the v2 engine:
        # MobileNet channel counts are mostly not lane-aligned, so the (M, C)
        # reshapes around Pallas GEMMs are physical relayouts; the XLA NHWC
        # path fuses the same folded epilogues without them.
        # dw_shifted: see MobileNetV2Int8Engine.  Default grouped (False)
        # for v1 as of round 5: round 4's +6.2% for "s2" did NOT reproduce
        # (r5 re-run 0.980x; 7-trial adjudication a wash — 1.002x median,
        # per-trial wins 4:3 — scripts/chip_dw_v1_adjudicate.py, receipt
        # bench_receipts/dw_v1_adjudicate_r5.jsonl), so the simpler mode
        # that matches v2 stands; "s2"/True remain bit-exact opt-ins.
        self.qw = variables["qweights"]
        # fp32 params/batch-stats: only consulted for EXCLUDED stem/fc (the
        # reference-canonical first/last exclusion runs fp32 in-engine like
        # ResNetInt8Engine — VERDICT r4 #4).
        self.params = variables.get("params", {})
        self.batch_stats = variables.get("batch_stats", {})
        self.num_classes = num_classes
        self.use_pallas = use_pallas
        self.dw_shifted = dw_shifted
        self.stem_dtype = stem_dtype
        self._stem_fp32 = (fold_bn_fp32(self.params, self.batch_stats,
                                        "stem", BN_EPS)
                           if self._node("stem") is None else None)
        self._fc_fp32 = (fc_fp32_params(self.params)
                         if self._node("fc") is None else None)
        self.forward = jax.jit(self._forward)
        # int8 ingest: images pre-quantized on the host onto the stem's grid
        # (qtpu.data.native.preprocess_quantize) — 4x less transfer.
        self.forward_codes = jax.jit(
            lambda xq: self._forward(xq, pre_quantized=True))
        # raw-uint8 ingest: see ResNetInt8Engine — the wire form that
        # composes with an excluded fp32 stem (on-device normalize).
        norm = normalize or ((0.0,), (1.0,))
        self._u8_norm = u8_normalize_coeffs(
            *norm, max(len(norm[0]), len(norm[1])))
        self.forward_u8 = jax.jit(
            lambda x8: self._forward(x8, raw_u8=True))

    def stem_grid(self):
        """The (scale, zp) grid host-side ingest must quantize onto."""
        node = self._node("stem")
        if node is None:
            raise ValueError("excluded (fp32) stem has no ingest grid — "
                             "feed fp32 images via forward()")
        return grid_of(node)

    def _node(self, *path: str) -> Optional[Dict[str, Array]]:
        node = self.qw
        for p in path:
            if p not in node:
                return None
            node = node[p]
        return node

    def _forward(self, x: Array, pre_quantized: bool = False,
                 raw_u8: bool = False) -> Array:
        stem = self._node("stem")
        fc = self._node("fc")
        n_blocks = len(V1_STRIDES)
        if raw_u8:
            a, b = self._u8_norm
            x = x.astype(jnp.float32) * a + b

        with annotate("stem"):
            first = grid_of(self._node("block0", "dw"))
            if stem is None:
                # Excluded stem: fp32 conv (BN folded at build), relu,
                # quantize onto block0's dw grid (the ResNetInt8Engine
                # fp32-stem path, v1 form — plain relu, not relu6).
                if pre_quantized:
                    raise ValueError("int8 ingest is unavailable with an "
                                     "excluded fp32 stem")
                w, b = self._stem_fp32
                y = jax.lax.conv_general_dilated(
                    jnp.asarray(x, self.stem_dtype),
                    jnp.asarray(w, self.stem_dtype), window_strides=(2, 2),
                    padding=self._pad3,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32) + b
                y = jnp.maximum(y, 0.0)
                fs, fz, fsym = grid_parts(first)
                x_q = qops.quantize_act(y, fs, fz, symmetric=fsym)
            else:
                if pre_quantized:        # int8 codes already on stem grid
                    x_q = x
                else:
                    x_q = qops.quantize_act(x, stem["act_scale"],
                                            stem["act_zp"],
                                            symmetric=grid_of(stem)[2])
                x_q = conv_xla(x_q, stem, strides=(2, 2), relu=True,
                               requant=first, padding=self._pad3)

        for i, s in enumerate(V1_STRIDES):
            dw = self._node(f"block{i}", "dw")
            pw = self._node(f"block{i}", "pw")
            if dw is None or pw is None:
                raise NotImplementedError(
                    "excluded block layers: use the module SERVE path")
            # the NEXT consumer's grid: next block's dw, or fp32 out for the
            # final block (mean-pool consumes fp32, then fc re-quantizes)
            nxt = (grid_of(self._node(f"block{i + 1}", "dw"))
                   if i + 1 < n_blocks else None)
            with annotate(f"block{i}"):
                c = x_q.shape[-1]
                y = conv_xla(x_q, dw, strides=(s, s), groups=c, relu=True,
                             requant=grid_of(pw), padding=self._pad3,
                             dw_shifted=(self.dw_shifted is True
                                         or (self.dw_shifted == "s2"
                                             and s > 1)))
                x_q = gemm_1x1(y, pw, relu=True, requant=nxt,
                               out_dtype=jnp.int8 if nxt is not None
                               else jnp.float32,
                               use_pallas=self.use_pallas)

        with annotate("head"):
            pooled = jnp.mean(x_q, axis=(1, 2))
            if fc is None:               # excluded fp32 fc: plain matmul
                w, b = self._fc_fp32
                return pooled @ w + b
            x_fc = qops.quantize_act(pooled, fc["act_scale"], fc["act_zp"],
                                     symmetric=grid_of(fc)[2])
            acc = qops.qmatmul(x_fc, unpacked_kernel(fc))
            return qops.dequant_epilogue(
                acc, act_scale=fc["act_scale"], act_zp=fc["act_zp"],
                w_scale=fc["w_scale"], colsum=fc["colsum"], bias=fc["bias"])

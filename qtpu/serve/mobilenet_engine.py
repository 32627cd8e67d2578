"""Hand-scheduled int8 MobileNet-v2 inference engine.

Flat int8-resident pipeline over frozen qweights (the MobileNet analog of
ResNetInt8Engine; BASELINE.json config 3's serving path):

* expand/project 1×1 convs as fused NHWC convs (relu6 and the inverted-
  residual add fused into the epilogues; Pallas GEMM path available but off
  by default — see __init__ note);
* depthwise 3×3 via XLA int8 grouped conv (faster than the Pallas depthwise
  kernel on this chip — see PARITY.md) with fused relu6+requant;
* activations stay int8 between layers on each consumer's calibrated grid.

Block layout mirrors qtpu.models.mobilenet.MobileNetV2: stem, block{i} with
expand/dw/project children (expand absent when t=1), head, fc.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from qtpu.bench.profile import annotate
from qtpu.nn.layers import BN_EPS
from qtpu.ops import qops
from qtpu.serve.fused_ops import (Grid, conv_xla, fc_fp32_params,
                                  fold_bn_fp32, gemm_1x1, grid_of,
                                  grid_parts, u8_normalize_coeffs,
                                  unpacked_kernel)

Array = jax.Array

# (expand, out_ch, repeats, stride) — must match models/mobilenet.py
V2_CFG = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
          (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1))


class MobileNetV2Int8Engine:
    """Flat int8 inference over frozen MobileNet-v2 qweights."""

    def __init__(self, variables: Dict[str, Any], num_classes: int,
                 use_pallas: bool = False, dw_shifted: bool = False,
                 torch_pad: bool = False, stem_dtype=jnp.float32,
                 normalize=None):
        # torch_pad: torchvision geometry (qtpu/data/import_torch.py) —
        # explicit (1,1) pads on the strided 3x3 stem/depthwise convs where
        # XLA SAME pads (0,1); stride-1 convs are identical either way.
        self.torch_pad = bool(torch_pad)
        self._pad3 = ((1, 1), (1, 1)) if torch_pad else "SAME"
        # dw_shifted: depthwise convs as shifted elementwise FMAs (pure XLA,
        # bit-exact — qops.qdepthwise_shifted) instead of the grouped-conv
        # op; targets the measured 186-409 GB/s grouped-conv ceiling with
        # the HBM-rate elementwise-fusion path.  True = all depthwise convs;
        # "s2" = strided ones only.  Default False (grouped): the round-4
        # e2e A/B (scripts/chip_dw_shifted_ab.py) measured v2 s2 0.899x /
        # all 0.831x vs grouped — v2's narrow early stride-2 shapes
        # (96-192 ch) lose more in the shifted form's 4x-row padding than
        # the per-shape standalone wins suggested.  (v1's round-4 "s2" win
        # did not reproduce in round 5 and its default reverted to grouped
        # too — see mobilenet_v1_engine.py.)
        self.dw_shifted = dw_shifted
        # use_pallas=False by default: MobileNet's channel counts are mostly
        # not lane-aligned, so the (M, C) reshapes around the Pallas GEMMs are
        # physical relayouts (measured 12.4k vs 16.9k img/s at B=64); the XLA
        # NHWC path fuses the same epilogues without them.
        self.qw = variables["qweights"]
        # fp32 params/batch-stats: only consulted for EXCLUDED stem/fc — the
        # reference's canonical first/last exclusion (SURVEY.md §1.2 R2) now
        # runs fp32 inside the flat engine exactly like ResNetInt8Engine
        # (round 4 measured the fp32 stem both faster and more accurate on
        # ResNet; VERDICT r4 #4 extends the idiom to the MobileNet families).
        self.params = variables.get("params", {})
        self.batch_stats = variables.get("batch_stats", {})
        self.num_classes = num_classes
        self.use_pallas = use_pallas
        self.stem_dtype = stem_dtype
        # Experiment-kernel dispatch table: EMPTY on the product engine, so
        # the qivr guard in _forward never fires.  Populated (and _qivr
        # provided) only by serve.experimental's subclass — the chained
        # inverted-residual kernel's measured-loser receipt lives there.
        self._qivr_prep: Dict[int, Dict[str, Any]] = {}
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

    def _blocks(self):
        out = []
        idx = 0
        for t, c, n, s in V2_CFG:
            for j in range(n):
                out.append((f"block{idx}", t, s if j == 0 else 1))
                idx += 1
        return out

    def _block_in_grid(self, name: str) -> Grid:
        node = self._node(name, "expand") or self._node(name, "dw")
        return grid_of(node)

    def _forward(self, x: Array, pre_quantized: bool = False,
                 raw_u8: bool = False) -> Array:
        blocks = self._blocks()
        stem = self._node("stem")
        head = self._node("head")
        fc = self._node("fc")
        if head is None:
            raise NotImplementedError(
                "excluded head: use the module SERVE path")
        if raw_u8:
            a, b = self._u8_norm
            x = x.astype(jnp.float32) * a + b

        with annotate("stem"):
            first = self._block_in_grid(blocks[0][0])
            if stem is None:
                # Excluded stem: fp32 conv (BN folded at build), relu6,
                # quantize onto the first block's grid (ResNetInt8Engine's
                # fp32-stem path, MobileNet form).
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
                y = jnp.clip(y, 0.0, 6.0)
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
                               act_max=6.0, requant=first,
                               padding=self._pad3)
        grid = first

        i = 0
        while i < len(blocks):
            name, t, stride = blocks[i]
            if i in self._qivr_prep:
                # whole identity-inverted-residual run in one chained kernel
                # (experiment guard: table empty on the product engine)
                prep = self._qivr_prep[i]
                with annotate(f"{name}_ivrun"):
                    x_q = self._qivr(x_q, i)
                grid = prep["tgt"]
                i += prep["nrun"]
                continue
            nxt = (self._block_in_grid(blocks[i + 1][0])
                   if i + 1 < len(blocks) else grid_of(head))
            expand = self._node(name, "expand")
            dw = self._node(name, "dw")
            project = self._node(name, "project")
            cout = unpacked_kernel(project).shape[-1]

            with annotate(name):
                y = x_q
                if expand is not None:
                    y = gemm_1x1(y, expand, relu=True, act_max=6.0,
                                 requant=grid_of(dw), out_dtype=jnp.int8,
                                 use_pallas=self.use_pallas)
                c = y.shape[-1]
                y = conv_xla(y, dw, strides=(stride, stride), groups=c,
                             relu=True, act_max=6.0,
                             requant=grid_of(project), padding=self._pad3,
                             dw_shifted=(self.dw_shifted is True
                                         or (self.dw_shifted == "s2"
                                             and stride > 1)))
                if stride == 1 and x_q.shape[-1] == cout:
                    # inverted residual: add fused into the project epilogue
                    x_q = gemm_1x1(y, project, relu=False, requant=nxt,
                                   out_dtype=jnp.int8, residual=x_q,
                                   res_grid=grid,
                                   use_pallas=self.use_pallas)
                else:
                    x_q = gemm_1x1(y, project, relu=False, requant=nxt,
                                   out_dtype=jnp.int8,
                                   use_pallas=self.use_pallas)
            grid = nxt
            i += 1

        with annotate("head"):
            x_q = gemm_1x1(x_q, head, relu=True, act_max=6.0, requant=None,
                           out_dtype=jnp.float32, use_pallas=self.use_pallas)
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

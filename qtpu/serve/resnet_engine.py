"""Hand-scheduled int8 ResNet inference engine (the images/sec bench target).

The module-level SERVE path (qtpu.nn layers) dequantizes to f32 between every
layer — correct and general, but it leaves fusion on the table.  This engine
runs ResNet-18/50 from the frozen ``qweights`` tree (``qtpu.transform.freeze``
output) as a flat int8-resident pipeline (SURVEY.md §3.5 target shape):

* all convolutions run on XLA's int8 MXU paths with FOLDED
  dequant+relu+requant epilogues (qops.epilogue_coeffs) — activations stay
  int8 across the bottleneck chain, quantized on each consumer's calibrated
  grid.  The round-2 measured rule: XLA-TPU keeps inter-fusion activations
  VMEM-resident (scoped S(1)), and inserting Pallas custom calls breaks
  that residency for more than the kernels win — so the default program is
  pure XLA, and the validated Pallas block kernels (qproj/qtail/qblock)
  are opt-ins (see the use_q* constructor notes);
* residual adds happen in f32 on the 1×1-project output, then one fused
  relu+requant produces the next block's int8 input;
* max-pool commutes with the (monotonic) quantizer, so the stem max-pool runs
  directly on int8 codes.

Chaining note: a block input feeds both the 1×1-reduce and the downsample
branch; the engine quantizes it ONCE on the reduce conv's calibrated grid and
reuses those codes for the downsample (the branches' separately calibrated
grids differ by less than a quantization step; agreement with the module
SERVE path is asserted in tests).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from qtpu.bench.profile import annotate
from qtpu.nn.layers import BN_EPS
from qtpu.ops import qops
from qtpu.ops.pallas.qblock import block_coeffs, qbottleneck_fused
from qtpu.ops.pallas.qproj import proj_coeffs, qproj2d_fused
from qtpu.ops.pallas.qstage import (proj_stage_coeffs, qstage_fused,
                                    qstage_proj_fused, stage_coeffs)
from qtpu.ops.pallas.qtail import qtail_fused, tail_coeffs
from qtpu.serve.fused_ops import (Grid,
                                  conv_xla as _fused_conv,
                                  dequant as _fused_dequant,
                                  gemm_1x1 as _fused_gemm,
                                  grid_of as _grid_of,
                                  grid_parts as _grid_parts,
                                  unpacked_kernel as _unpacked_kernel)

Array = jax.Array


def _qblock_bb(B: int, H: int, W: int, cap: int = 32) -> int:
    """Batch tile for the fused bottleneck kernel: target ~4k GEMM rows per
    grid step (fills the MXU on the deep 7x7/14x14 stages) while dividing B
    and staying under the VMEM cap."""
    bb = 1
    while (bb * 2 <= min(B, cap) and B % (bb * 2) == 0
           and bb * 2 * H * W <= 4096):
        bb *= 2
    return bb


class ResNetInt8Engine:
    """Flat int8 inference over frozen ResNet qweights.

    ``arch``: dict(stage_sizes, width, bottleneck, cifar_stem, num_classes
    [, torch_pad]).  ``torch_pad=True`` runs the torchvision geometry the
    torch importer produces (qtpu/data/import_torch.py): explicit symmetric
    pads on the 7x7 stem / 3x3 max-pool / strided 3x3 convs where XLA SAME
    pads (0,1) — output shapes are identical, only pixel offsets move, and
    the engine must match the model bit-for-bit.
    ``variables``: freeze() output.  Excluded stem/fc (the canonical config-5
    first/last exclusion) run in fp32 inside the engine — stem BN folded with
    running stats at build time, fc as a plain fp32 matmul; other excluded
    layers need the module SERVE path.
    """

    def __init__(self, variables: Dict[str, Any], arch: Dict[str, Any],
                 use_pallas: bool = False, min_ci_pallas: int = 64,
                 use_qblock: Optional[bool] = None,
                 qblock_interpret: bool = False,
                 use_qtail: Optional[bool] = None,
                 qtail_interpret: bool = False,
                 use_qproj: Optional[bool] = None,
                 qproj_stages: Optional[Tuple[int, ...]] = None,
                 use_qstage: Optional[bool] = None,
                 qstage_stages: Optional[Tuple[int, ...]] = None,
                 qstage_interpret: bool = False,
                 qstage_proj: bool = False):
        self.qw = variables["qweights"]
        # fp32 params/batch-stats: only consulted for *excluded* layers
        # (config 5 excludes stem*/fc — SURVEY.md §1.2 canonical first/last
        # exclusion); quantized layers live entirely in qweights.
        self.params = variables.get("params", {})
        self.batch_stats = variables.get("batch_stats", {})
        self.arch = dict(arch)
        # torchvision geometry: explicit pads everywhere a strided window
        # would otherwise take XLA's asymmetric SAME pads (see class doc).
        self.torch_pad = bool(self.arch.get("torch_pad", False))
        self._pad3 = ((1, 1), (1, 1)) if self.torch_pad else "SAME"
        # use_pallas=False default: after the NHWC 1x1 fix in fused_ops the
        # XLA path fuses the same epilogues without the (M,C) relayout the
        # Pallas GEMMs require — measured 11.2k vs 6.6k img/s @ B=32 and
        # 14.3k vs 7.7k @ B=128 on ResNet-50. The Pallas path remains for the
        # planned whole-block fusion (ROADMAP #1) where the relayout amortizes.
        self.use_pallas = use_pallas
        self.min_ci_pallas = min_ci_pallas
        # use_qblock: fuse identity bottlenecks (conv1->conv2->conv3+residual)
        # into one Pallas kernel (qtpu.ops.pallas.qblock). Bit-identical to
        # the 3-op sequence (tests/test_pallas_qblock.py, verified on-chip).
        # Default OFF: the device trace (scripts/chip_qblock_stage_bench.py,
        # 2026-08-17) shows XLA already cross-fuses conv2+conv3+residual in
        # these blocks (~210us/block layer1 @ B=32) while the monolithic
        # kernel serializes its MXU/VPU phases (~506us) — the fused kernel
        # loses 2-5x on every stage. Kept as a validated opt-in for future
        # kernel-scheduling work; the measured e2e lever is the stem
        # (fusion.3: 565us/step, 20% of forward — see qtpu/bench/tracing.py).
        if use_qblock is None:
            use_qblock = False
        self.use_qblock = use_qblock and self.arch.get("bottleneck", True)
        self.qblock_interpret = qblock_interpret
        # use_qtail: fuse the identity-bottleneck TAIL (conv2→conv3+residual)
        # into one Pallas kernel (qtpu.ops.pallas.qtail), targeting XLA's
        # 38-55%-of-roofline block fusions.  conv1 stays on the XLA path
        # (its fusion already runs at HBM rate).  Default OFF: measured
        # 2026-08-18 (scripts/chip_qtail_bench.py, B=128, one process):
        # 8.39 ms XLA vs 23.6 ms with qtail+qproj — bit-identical but the
        # monolithic per-step bodies serialize against their DMA just like
        # qblock did.  Kept as a validated opt-in for kernel-scheduling
        # work; see the chip script for per-stage numbers.
        if use_qtail is None:
            use_qtail = False
        self.use_qtail = (use_qtail and self.arch.get("bottleneck", True)
                          and not self.use_qblock)
        self.qtail_interpret = qtail_interpret
        self._qtail_prep: Dict[str, Dict[str, Any]] = {}
        if self.use_qtail:
            self._prepare_qtails()
        # use_qproj: fuse the projection-block tail (conv3 + downsample GEMM
        # + relu + requant) into one zero-cast 2-D Pallas kernel
        # (qtpu.ops.pallas.qproj.qproj2d_fused), eliminating the downsample
        # branch's f32 HBM round trip (411 MB at layer1_0/B=128).  In
        # ISOLATION the kernel wins 1.8-4.4x per stage, bit-exact
        # (scripts/chip_2d_bench.py).  Default OFF anyway: in the full
        # engine even a single custom call is a NET LOSS (same-process A/B
        # 2026-08-18, scripts/chip_qproj_ab.py, B=128: 8.1-8.3 ms XLA-only
        # vs 9.4-9.5 ms with just layer1_0's kernel, whose own time is only
        # 466us) — inserting a custom call breaks XLA-TPU's scoped-VMEM
        # (S(1)) activation residency around it, and unrelated scopes slow
        # by far more than the kernel saves (trace: stem +319us, layer1_1
        # +411us/step).  An XLA-native block-diagonal dual GEMM was also
        # measured and loses 2.5x (the int32 2*Cout accumulator
        # materializes — scripts/chip_xladual_bench.py), so the f32 round
        # trip stands until whole-program Pallas serving (ROADMAP).
        if use_qproj is None:
            use_qproj = False
        self.use_qproj = use_qproj and self.arch.get("bottleneck", True)
        # qproj_stages: stage indices (0-based) whose projection block uses
        # the kernel when use_qproj is set.
        self.qproj_stages = ((0, 1, 2, 3) if qproj_stages is None
                             else tuple(qproj_stages))
        self._qproj_prep: Dict[str, Dict[str, Any]] = {}
        if self.use_qproj:
            self._prepare_qprojs()
        self._qblock_prep: Dict[str, Dict[str, Array]] = {}
        if self.use_qblock:
            self._prepare_qblocks()
        # use_qstage: run each stage's WHOLE identity-block chain as ONE
        # Pallas kernel (qtpu.ops.pallas.qstage) — the pure-2-D chained form
        # both round-2 findings point at: zero Mosaic layout casts (the 3x3
        # is nine row-shifted GEMMs) and the custom-call residency penalty
        # amortized over the chain.  Bit-identical to the per-block XLA
        # sequence (tests/test_pallas_qstage.py); on-chip numbers in
        # scripts/chip_qstage_bench.py.
        if use_qstage is None:
            use_qstage = False
        self.use_qstage = use_qstage and self.arch.get("bottleneck", True)
        self.qstage_stages = ((0, 1, 2, 3) if qstage_stages is None
                              else tuple(qstage_stages))
        self.qstage_interpret = qstage_interpret
        # qstage_proj: additionally chain a stage's stride-1 PROJECTION block
        # (conv1 -> conv2 -> conv3 + downsample GEMM) into the same kernel
        # (qstage_proj_fused) — covers the WHOLE stage with one custom call
        # and removes the downsample branch's f32 HBM round trip (411 MB at
        # layer1_0/B=128, the single largest traced cost).  Only stride-1
        # projection stages qualify (layer1); strided stages keep the XLA
        # projection ahead of the identity chain.  Bit-identical to the XLA
        # sequence (tests/test_pallas_qstage_proj.py).
        self.qstage_proj = qstage_proj
        self._qstage_prep: Dict[int, Dict[str, Any]] = {}
        if self.use_qstage:
            self._prepare_qstages()
        # Excluded stem/fc run in fp32 inside the flat engine (BN folded with
        # running stats — same fold freeze applies to quantized ConvBNs).
        self._stem_fp32 = (self._fold_fp32("stem")
                           if self._node("stem") is None else None)
        self._fc_fp32 = None
        if self._node("fc") is None:
            p = self.params.get("fc")
            if p is None or "kernel" not in p:
                raise ValueError("fc neither quantized nor present in params")
            self._fc_fp32 = (jnp.asarray(p["kernel"], jnp.float32),
                             jnp.asarray(p.get("bias",
                                               jnp.zeros(p["kernel"].shape[-1])),
                                         jnp.float32))
        self.forward = jax.jit(self._forward)
        # int8 ingest: images pre-quantized on the host onto the stem's grid
        # (qtpu.data.native.preprocess_quantize) — 4x less transfer.
        self.forward_codes = jax.jit(
            lambda xq: self._forward(xq, pre_quantized=True))

    def stem_grid(self) -> Grid:
        """The (scale, zp) grid host-side ingest must quantize onto."""
        node = self._node("stem")
        if node is None:
            raise ValueError("excluded (fp32) stem has no ingest grid — "
                             "feed fp32 images via forward()")
        return _grid_of(node)

    def _fold_fp32(self, name: str):
        """Eval-time BN fold of an excluded ConvBN's fp32 params."""
        p = self.params.get(name)
        if p is None or "kernel" not in p:
            raise ValueError(f"layer {name} neither quantized nor in params")
        w = jnp.asarray(p["kernel"], jnp.float32)
        bn = (self.batch_stats or {}).get(name)
        if bn is not None and "mean" in bn:
            gamma = jnp.asarray(p["scale"], jnp.float32)
            sigma = jnp.sqrt(jnp.asarray(bn["var"], jnp.float32) + BN_EPS)
            b = (jnp.asarray(p["bias"], jnp.float32)
                 - gamma * jnp.asarray(bn["mean"], jnp.float32) / sigma)
            w = w * (gamma / sigma)
        else:
            b = jnp.asarray(p.get("bias", jnp.zeros((w.shape[-1],))),
                            jnp.float32)
        return w, b

    # -- frozen-node helpers ---------------------------------------------

    def _node(self, *path: str) -> Optional[Dict[str, Array]]:
        node = self.qw
        for p in path:
            if p not in node:
                return None
            node = node[p]
        return node

    def _block_names(self):
        out = []
        for i, n in enumerate(self.arch["stage_sizes"]):
            for j in range(n):
                out.append((f"layer{i + 1}_{j}", i, j))
        return out

    # -- fused bottleneck-tail kernel (round-2 default fast path) ----------

    def _prepare_qtails(self) -> None:
        """Reshape identity-block conv2/conv3 weights once for qtail_fused."""
        for name, _, j in self._block_names():
            if j == 0:          # projection/strided block: unfused path
                continue
            c2, c3 = self._node(name, "conv2"), self._node(name, "conv3")
            if c2 is None or c3 is None:
                continue
            if any(_grid_of(c)[2] for c in (c2, c3)):
                continue        # qtail requants affine-only (tail_coeffs)
            w2 = _unpacked_kernel(c2)
            w3 = _unpacked_kernel(c3)
            kh, kw, cmid, cmid2 = w2.shape
            cout = w3.shape[-1]
            if (kh, kw) != (3, 3) or cmid != cmid2:
                continue
            # Mosaic shape-cast rule: (rows, C) <-> (bb, H, W*C) casts need
            # C % 128 == 0; pair pixels (P=2) for Cmid=64 stages (layer1).
            pair = 1 if cmid % 128 == 0 and cout % 128 == 0 else 2
            if (cmid * pair) % 128 or (cout * pair) % 128:
                continue
            self._qtail_prep[name] = dict(
                pair=pair, w2=w2.reshape(kh * kw, cmid, cmid),
                w3=w3.reshape(cmid, cout))

    def _prepare_qprojs(self) -> None:
        """Reshape projection-block conv3/down weights once for qproj_fused."""
        for name, i, j in self._block_names():
            if j != 0 or i not in self.qproj_stages:
                continue
            c3, down = self._node(name, "conv3"), self._node(name, "down")
            if c3 is None or down is None:
                continue
            if _grid_of(c3)[2] or _grid_of(down)[2]:
                continue        # qproj requants affine-only (proj_coeffs)
            w3 = _unpacked_kernel(c3)
            wd = _unpacked_kernel(down)
            cmid, cout = w3.shape[-2:]
            cin = wd.shape[-2]
            pair = 1
            while ((cmid * pair) % 128 or (cin * pair) % 128
                   or (cout * pair) % 128):
                pair *= 2
                if pair > 4:
                    break
            if pair > 4:
                continue
            self._qproj_prep[name] = dict(
                pair=pair, w3=w3.reshape(cmid, cout), wd=wd.reshape(cin, cout))

    def _qproj(self, b: Array, x_d: Array, name: str,
               next_grid: Grid) -> Array:
        c3, down = self._node(name, "conv3"), self._node(name, "down")
        prep = self._qproj_prep[name]
        B, H, W, cmid = b.shape
        m = B * H * W
        # 2-D form: the NHWC→(M, C) reshapes are free byte-identities in
        # XLA, and the kernel then has zero vector-layout casts (see
        # qproj2d_fused docstring).
        out = qproj2d_fused(
            b.reshape(m, cmid), x_d.reshape(m, x_d.shape[-1]),
            w3=prep["w3"], wd=prep["wd"],
            **proj_coeffs(c3, down, next_grid),
            interpret=self.qtail_interpret)
        return out.reshape(B, H, W, out.shape[-1])

    def _qtail(self, x_q: Array, x_grid: Grid, name: str,
               next_grid: Grid) -> Array:
        c1, c2, c3 = (self._node(name, k) for k in ("conv1", "conv2", "conv3"))
        prep = self._qtail_prep[name]
        a = self._gemm(x_q, c1, relu=True, requant=_grid_of(c2),
                       out_dtype=jnp.int8)
        # zp-pad for SAME conv2 — XLA streams this copy at HBM rate, which
        # keeps the kernel free of the serialized in-kernel pad fill that
        # sank the monolithic qblock kernel.
        a_pad = jax.lax.pad(
            a, c2["act_zp"].astype(jnp.int8),
            ((0, 0, 0), (1, 1, 0), (1, 1, 0), (0, 0, 0)))
        return qtail_fused(
            a_pad, x_q, **tail_coeffs(c2, c3, next_grid, x_grid),
            interpret=self.qtail_interpret, **prep)

    # -- fused whole-bottleneck kernel (ROADMAP #1) ------------------------

    def _prepare_qblocks(self) -> None:
        """Reshape identity-bottleneck weights once for qbottleneck_fused."""
        for name, _, j in self._block_names():
            if j == 0:          # projection/strided block: unfused path
                continue
            c1, c2, c3 = (self._node(name, k)
                          for k in ("conv1", "conv2", "conv3"))
            if c1 is None or c2 is None or c3 is None:
                continue
            if any(_grid_of(c)[2] for c in (c1, c2, c3)):
                continue        # qblock requants affine-only (block_scalars)
            w1 = _unpacked_kernel(c1)
            w2 = _unpacked_kernel(c2)
            w3 = _unpacked_kernel(c3)
            kh, kw, cmid, cmid2 = w2.shape
            cin = w1.shape[-2]
            if (kh, kw) != (3, 3) or cmid != cmid2 or w3.shape[-1] != cin:
                continue
            # Mosaic shape-cast rule (measured): (rows, C) <-> (bb, H, W*C)
            # casts need C % 128 == 0; pair pixels (P=2) for Cmid=64 stages.
            pair = 1 if cmid % 128 == 0 else 2
            if (cmid * pair) % 128 or (cin * pair) % 128:
                continue
            self._qblock_prep[name] = dict(
                pair=pair,
                w1=w1.reshape(cin, cmid), w2=w2.reshape(kh * kw, cmid, cmid),
                w3=w3.reshape(cmid, cin))

    def _prepare_qstages(self) -> None:
        """Stack each stage's identity-run weights/coeffs for qstage_fused.

        Stage i qualifies when every identity block (j >= 1) is a frozen
        3x3 bottleneck on affine grids and the grid AFTER the run (next
        stage's conv1, or fc for the last stage) is affine too — the same
        dispatch rule as qblock, applied to the whole chain.
        """
        sizes = self.arch["stage_sizes"]
        for i, n in enumerate(sizes):
            if n < 2 or i not in self.qstage_stages:
                continue
            if i + 1 < len(sizes):
                tgt_node = self._node(f"layer{i + 2}_0", "conv1")
            else:
                tgt_node = self._node("fc")
            if tgt_node is None:
                # Excluded consumer (e.g. config-5's fp32 fc): the stage's
                # output must leave on the baseline's fp32/unfused path, so
                # the chain silently falls back per-block.  Under fc
                # exclusion the LAST stage (layer4) therefore never uses
                # qstage even when requested — A/B users take note.
                print(f"qstage: stage {i} skipped "
                      f"(consumer excluded -> fp32 out)", flush=True)
                continue
            tgt = _grid_of(tgt_node)
            if tgt[2]:
                continue                      # symmetric grid: unfused path
            blocks = []
            ok = True
            for j in range(1, n):
                cs = tuple(self._node(f"layer{i + 1}_{j}", k)
                           for k in ("conv1", "conv2", "conv3"))
                if (any(c is None for c in cs)
                        or self._node(f"layer{i + 1}_{j}", "down") is not None
                        or any(_grid_of(c)[2] for c in cs)):
                    ok = False
                    break
                blocks.append(cs)
            if not ok:
                continue
            w2s = [_unpacked_kernel(c2) for _, c2, _ in blocks]
            if any(w.shape[:2] != (3, 3) for w in w2s):
                continue
            cin = _unpacked_kernel(blocks[0][0]).shape[-2]
            cmid = w2s[0].shape[-1]
            weights = dict(
                w1=jnp.stack([_unpacked_kernel(c1).reshape(cin, cmid)
                              for c1, _, _ in blocks]),
                w2=jnp.concatenate([w.reshape(9, cmid, cmid) for w in w2s]),
                w3=jnp.stack([_unpacked_kernel(c3).reshape(cmid, cin)
                              for _, _, c3 in blocks]))
            proj = self._qstage_proj_nodes(i) if self.qstage_proj else None
            if proj is not None:
                c1, c2, c3, down = proj
                cp = _unpacked_kernel(c1).shape[-2]
                cm = _unpacked_kernel(c1).shape[-1]
                weights.update(
                    wp1=_unpacked_kernel(c1).reshape(cp, cm),
                    wp2=_unpacked_kernel(c2).reshape(9, cm, cm),
                    wp3=_unpacked_kernel(c3).reshape(cm, cin),
                    wd=_unpacked_kernel(down).reshape(cp, cin))
                coeffs = proj_stage_coeffs(proj, blocks, (tgt[0], tgt[1]))
            else:
                coeffs = stage_coeffs(blocks, (tgt[0], tgt[1]))
            self._qstage_prep[i] = dict(nrun=n - 1, weights=weights,
                                        coeffs=coeffs, tgt=tgt)

    def _qstage_proj_nodes(self, i: int):
        """The stage's projection-block nodes when chainable, else None.

        Chainable = stride-1 stage (stage 0 only — later stages downsample),
        all four convs present on affine grids, 3x3 conv2.
        """
        if i != 0:
            return None
        cs = tuple(self._node(f"layer{i + 1}_0", k)
                   for k in ("conv1", "conv2", "conv3", "down"))
        if any(c is None for c in cs) or any(_grid_of(c)[2] for c in cs):
            return None
        if _unpacked_kernel(cs[1]).shape[:2] != (3, 3):
            return None
        return cs

    def _qstage(self, x_q: Array, stage: int) -> Tuple[Array, Grid]:
        prep = self._qstage_prep[stage]
        B, H, W, C = x_q.shape
        fn = (qstage_proj_fused if "wp1" in prep["weights"]
              else qstage_fused)
        cout = prep["weights"]["w3"].shape[-1]
        out = fn(x_q.reshape(B * H * W, C), **prep["weights"],
                 **prep["coeffs"], h=H, w=W, interpret=self.qstage_interpret)
        return out.reshape(B, H, W, cout), prep["tgt"]

    def _qblock(self, x_q: Array, name: str, next_grid: Grid) -> Array:
        c1, c2, c3 = (self._node(name, k) for k in ("conv1", "conv2", "conv3"))
        B, H, W, _ = x_q.shape
        prep = self._qblock_prep[name]
        return qbottleneck_fused(
            x_q, **block_coeffs(c1, c2, c3, next_grid),
            bb=_qblock_bb(B, H, W), interpret=self.qblock_interpret, **prep)

    # -- fused layer primitives ------------------------------------------

    def _gemm(self, x_q: Array, node: Dict[str, Array], *, relu: bool,
              requant, out_dtype, residual=None, res_grid=None) -> Array:
        return _fused_gemm(x_q, node, relu=relu, requant=requant,
                           out_dtype=out_dtype, residual=residual,
                           res_grid=res_grid, use_pallas=self.use_pallas,
                           min_ci_pallas=self.min_ci_pallas)

    def _conv_xla(self, x_q: Array, node: Dict[str, Array], *, strides,
                  relu: bool, requant, padding="SAME") -> Array:
        return _fused_conv(x_q, node, strides=strides, relu=relu,
                           requant=requant, padding=padding)

    @staticmethod
    def _dequant(x_q: Array, grid) -> Array:
        return _fused_dequant(x_q, grid)

    # -- network ----------------------------------------------------------

    def _stem(self, x: Array, first_grid: Grid,
              pre_quantized: bool = False) -> Array:
        node = self._node("stem")
        cifar = self.arch.get("cifar_stem", False)
        strides = (1, 1) if cifar else (2, 2)
        # torch geometry (models/resnet.py): 7x7 stem pads (3,3), the 3x3/2
        # max-pool pads (1,1); the cifar 3x3/1 stem's (1,1) == SAME.
        if self.torch_pad and not cifar:
            conv_pad = ((3, 3), (3, 3))
            pool_pad = ((0, 0), (1, 1), (1, 1), (0, 0))
        else:
            conv_pad, pool_pad = "SAME", "SAME"
        if node is None:
            # Excluded stem: fp32 conv (BN folded at build), relu, quantize
            # onto the first block's grid, then max-pool on int8 codes
            # (pooling commutes with the monotonic quantizer).
            if pre_quantized:
                raise ValueError(
                    "int8 ingest is unavailable with an excluded fp32 stem")
            w, b = self._stem_fp32
            y = jax.lax.conv_general_dilated(
                jnp.asarray(x, jnp.float32), w, window_strides=strides,
                padding=conv_pad, dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32) + b
            y = jnp.maximum(y, 0.0)
            fs, fz, fsym = _grid_parts(first_grid)
            y_q = qops.quantize_act(y, fs, fz, symmetric=fsym)
            if not cifar:
                y_q = jax.lax.reduce_window(
                    y_q, jnp.int8(-128), jax.lax.max, (1, 3, 3, 1),
                    (1, 2, 2, 1), pool_pad)
            return y_q
        if pre_quantized:
            x_q = x                      # already on the stem's grid (int8)
        else:
            x_q = qops.quantize_act(x, node["act_scale"], node["act_zp"],
                                    symmetric=_grid_of(node)[2])
        y_q = self._conv_xla(x_q, node, strides=strides, relu=True,
                             requant=first_grid, padding=conv_pad)
        if not cifar:
            y_q = jax.lax.reduce_window(
                y_q, jnp.int8(-128), jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
                pool_pad)
        return y_q

    def _bottleneck(self, x_q: Array, x_grid: Grid, name: str,
                    strides, next_grid: Grid) -> Array:
        c1, c2, c3 = (self._node(name, k) for k in ("conv1", "conv2", "conv3"))
        down = self._node(name, "down")
        if (down is None and strides == (1, 1)
                and name in self._qblock_prep
                and next_grid is not None and not _grid_parts(next_grid)[2]
                and x_q.shape[2] % self._qblock_prep[name]["pair"] == 0):
            return self._qblock(x_q, name, next_grid)
        if (down is None and strides == (1, 1)
                and name in self._qtail_prep
                and next_grid is not None and not _grid_parts(next_grid)[2]
                and not _grid_parts(x_grid)[2]
                and x_q.shape[2] % self._qtail_prep[name]["pair"] == 0):
            return self._qtail(x_q, x_grid, name, next_grid)
        a = self._gemm(x_q, c1, relu=True, requant=_grid_of(c2),
                       out_dtype=jnp.int8)
        b = self._conv_xla(a, c2, strides=strides, relu=True,
                           requant=_grid_of(c3), padding=self._pad3)
        if down is not None:
            x_d = x_q[:, ::strides[0], ::strides[1], :]
            if (name in self._qproj_prep and next_grid is not None
                    and not _grid_parts(next_grid)[2]
                    and b.shape[2] % self._qproj_prep[name]["pair"] == 0):
                return self._qproj(b, x_d, name, next_grid)
            res = self._gemm(x_d, down,
                             relu=False, requant=None, out_dtype=jnp.float32)
            res_grid = None          # f32 residual (4 blocks only)
        else:
            res = x_q                # int8 codes reused: zero extra traffic
            res_grid = x_grid
        # project 1x1 with residual add + relu + requant fused in the epilogue
        # (next_grid None — excluded fp32 fc — leaves the output in fp32)
        return self._gemm(b, c3, relu=True, requant=next_grid,
                          out_dtype=jnp.int8 if next_grid is not None
                          else jnp.float32,
                          residual=res, res_grid=res_grid)

    def _basic(self, x_q: Array, x_grid: Grid, name: str, strides,
               next_grid: Grid) -> Array:
        c1, c2 = (self._node(name, k) for k in ("conv1", "conv2"))
        down = self._node(name, "down")
        a = self._conv_xla(x_q, c1, strides=strides, relu=True,
                           requant=_grid_of(c2), padding=self._pad3)
        b = self._conv_xla(a, c2, strides=(1, 1), relu=False, requant=None,
                           padding=self._pad3)
        if down is not None:
            r = self._gemm(x_q[:, ::strides[0], ::strides[1], :], down,
                           relu=False, requant=None, out_dtype=jnp.float32)
        else:
            r = self._dequant(x_q, x_grid)
        y = jnp.maximum(b + r, 0.0)
        if next_grid is None:        # excluded fp32 fc consumes fp32
            return y
        ns, nz, nsym = _grid_parts(next_grid)
        return qops.quantize_act(y, ns, nz, symmetric=nsym)

    def _forward(self, x: Array, pre_quantized: bool = False) -> Array:
        bottleneck = self.arch.get("bottleneck", True)
        names = self._block_names()
        first = self._node(names[0][0], "conv1")
        fc = self._node("fc")
        with annotate("stem"):
            x_q = self._stem(x, _grid_of(first), pre_quantized=pre_quantized)
        grid = _grid_of(first)
        idx = 0
        while idx < len(names):
            name, i, j = names[idx]
            if (j == 0 and i in self._qstage_prep
                    and "wp1" in self._qstage_prep[i]["weights"]):
                # WHOLE stage (projection + identity run) in one kernel
                with annotate(f"layer{i + 1}_stage"):
                    x_q, grid = self._qstage(x_q, i)
                idx += self._qstage_prep[i]["nrun"] + 1
                continue
            if (j == 1 and i in self._qstage_prep
                    and "wp1" not in self._qstage_prep[i]["weights"]):
                # whole identity run of this stage in one chained kernel
                with annotate(f"layer{i + 1}_idrun"):
                    x_q, grid = self._qstage(x_q, i)
                idx += self._qstage_prep[i]["nrun"]
                continue
            strides = (2, 2) if (i > 0 and j == 0) else (1, 1)
            if idx + 1 < len(names):
                nxt = _grid_of(self._node(names[idx + 1][0], "conv1"))
            else:
                # excluded fp32 fc: the final block emits fp32 (no requant)
                nxt = _grid_of(fc) if fc is not None else None
            step = self._bottleneck if bottleneck else self._basic
            with annotate(name):
                x_q = step(x_q, grid, name, strides, nxt)
            grid = nxt
            idx += 1
        with annotate("head"):
            if fc is None:
                pooled = jnp.mean(x_q, axis=(1, 2))   # fp32 from final block
                w, b = self._fc_fp32
                return pooled @ w + b
            pooled = jnp.mean(self._dequant(x_q, grid), axis=(1, 2))
            x_fc_q = qops.quantize_act(pooled, fc["act_scale"], fc["act_zp"],
                                       symmetric=_grid_of(fc)[2])
            acc = qops.qmatmul(x_fc_q, _unpacked_kernel(fc))
            return qops.dequant_epilogue(
                acc, act_scale=fc["act_scale"], act_zp=fc["act_zp"],
                w_scale=fc["w_scale"], colsum=fc["colsum"], bias=fc["bias"])

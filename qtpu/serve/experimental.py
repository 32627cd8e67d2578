"""Experiment-kernel engine variants (the measured-loser museum).

The product engines (qtpu.serve.resnet_engine / mobilenet_engine) run the
pure-XLA int8 path — the round-2/3 measured optimum: XLA-TPU keeps
inter-fusion activations VMEM-resident (scoped S(1)), and inserting Pallas
custom calls breaks that residency for more than the kernels win.  The
validated opt-in kernel families live HERE, on subclasses, so the product
constructors carry no experiment prep/guard code (VERDICT r3 weak #4).

Every family below is bit-identical to the XLA sequence it replaces
(tests/test_pallas_*.py) and carries its on-chip verdict:

* ``use_qblock`` — whole identity bottleneck (conv1→conv2→conv3+residual)
  as one Pallas kernel (qtpu.ops.pallas.qblock).  Measured 2026-08-17
  (scripts/chip_qblock_stage_bench.py): XLA cross-fuses conv2+conv3+residual
  at ~210us/block (layer1, B=32) while the monolithic kernel serializes its
  MXU/VPU phases (~506us) — loses 2-5x on every stage.
* ``use_qtail`` — identity-block TAIL (conv2→conv3+residual) as one kernel
  (qtpu.ops.pallas.qtail); conv1 stays on XLA.  Measured 2026-08-18
  (scripts/chip_qtail_bench.py, B=128): 8.39 ms XLA vs 23.6 ms fused —
  the per-step bodies serialize against their DMA just like qblock.
* ``use_qproj`` — projection-block tail (conv3 + downsample GEMM + relu +
  requant) as one zero-cast 2-D kernel (qtpu.ops.pallas.qproj).  Wins
  1.8-4.4x in ISOLATION (scripts/chip_2d_bench.py) but a single custom
  call is a NET LOSS in the full engine (scripts/chip_qproj_ab.py, B=128:
  8.1-8.3 ms XLA-only vs 9.4-9.5 ms with one 466us kernel) — the scoped-
  VMEM residency penalty lands on *unrelated* scopes (stem +319us,
  layer1_1 +411us/step).  The XLA-native block-diagonal dual GEMM
  alternative loses 2.5x (int32 2*Cout accumulator materializes —
  scripts/chip_xladual_bench.py).
* ``use_qstage`` — each stage's whole identity-block chain as ONE chained
  2-D kernel (qtpu.ops.pallas.qstage): zero Mosaic layout casts, custom-
  call boundary amortized over the chain.  Measured round 3
  (scripts/chip_qstage_ab.py): still loses e2e; the residency penalty is
  per-boundary and the chain only removes interior boundaries.
* ``qstage_proj`` — additionally chain the stage's stride-1 projection
  block into the same kernel (whole stage, one custom call).  Measured
  round 3: loses for the same mechanism (BASELINE.md round-3 p0 section).
* ``use_qivr`` (MobileNet-v2) — each maximal identity inverted-residual
  run as one chained 2-D kernel with the 3x3 depthwise as nine row-shifted
  VPU multiplies (qtpu.ops.pallas.qivr).  Measured round 3
  (scripts/chip_qivr_bench.py): loses e2e, same custom-call-residency
  mechanism.

Kept because they are the receipts for the "pure XLA is the optimum"
claim, and as the substrate for future whole-program Pallas serving
(ROADMAP #1).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from qtpu.ops.pallas.qblock import block_coeffs, qbottleneck_fused
from qtpu.ops.pallas.qproj import proj_coeffs, qproj2d_fused
from qtpu.ops.pallas.qstage import (proj_stage_coeffs, qstage_fused,
                                    qstage_proj_fused, stage_coeffs)
from qtpu.ops.pallas.qtail import qtail_fused, tail_coeffs
from qtpu.serve.fused_ops import (Grid, grid_of as _grid_of,
                                  unpacked_kernel as _unpacked_kernel)
from qtpu.serve.mobilenet_engine import MobileNetV2Int8Engine
from qtpu.serve.resnet_engine import ResNetInt8Engine

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


class ExperimentalResNetInt8Engine(ResNetInt8Engine):
    """ResNetInt8Engine + the opt-in Pallas kernel families (module doc).

    Flags default OFF; with all flags off this is bit-identical to the
    product engine (it IS the product engine — the base dispatch guards
    check the prep tables this subclass populates).
    """

    def __init__(self, variables: Dict[str, Any], arch: Dict[str, Any],
                 use_pallas: bool = False, min_ci_pallas: int = 64,
                 packed_int4: bool = False,
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
        super().__init__(variables, arch, use_pallas=use_pallas,
                         min_ci_pallas=min_ci_pallas, packed_int4=packed_int4)
        self.use_qblock = bool(use_qblock) and self.arch.get("bottleneck",
                                                             True)
        self.qblock_interpret = qblock_interpret
        self.use_qtail = (bool(use_qtail)
                          and self.arch.get("bottleneck", True)
                          and not self.use_qblock)
        self.qtail_interpret = qtail_interpret
        self.use_qproj = bool(use_qproj) and self.arch.get("bottleneck", True)
        # qproj_stages: stage indices (0-based) whose projection block uses
        # the kernel when use_qproj is set.
        self.qproj_stages = ((0, 1, 2, 3) if qproj_stages is None
                             else tuple(qproj_stages))
        self.use_qstage = bool(use_qstage) and self.arch.get("bottleneck",
                                                             True)
        self.qstage_stages = ((0, 1, 2, 3) if qstage_stages is None
                              else tuple(qstage_stages))
        self.qstage_interpret = qstage_interpret
        self.qstage_proj = qstage_proj
        # Populate the base engine's (empty) dispatch tables.  forward was
        # jit-wrapped by the base constructor but traces lazily, so filling
        # the tables here still shapes the compiled program.
        if self.use_qtail:
            self._prepare_qtails()
        if self.use_qproj:
            self._prepare_qprojs()
        if self.use_qblock:
            self._prepare_qblocks()
        if self.use_qstage:
            self._prepare_qstages()

    # -- whole-bottleneck kernel (qblock) ----------------------------------

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

    def _qblock(self, x_q: Array, name: str, next_grid: Grid) -> Array:
        c1, c2, c3 = (self._node(name, k) for k in ("conv1", "conv2", "conv3"))
        B, H, W, _ = x_q.shape
        prep = self._qblock_prep[name]
        return qbottleneck_fused(
            x_q, **block_coeffs(c1, c2, c3, next_grid),
            bb=_qblock_bb(B, H, W), interpret=self.qblock_interpret, **prep)

    # -- bottleneck-tail kernel (qtail) ------------------------------------

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

    # -- projection-tail kernel (qproj) ------------------------------------

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

    # -- whole-stage chained kernel (qstage / qstage_proj) -----------------

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


class ExperimentalMobileNetV2Int8Engine(MobileNetV2Int8Engine):
    """MobileNetV2Int8Engine + the opt-in chained qivr kernel (module doc)."""

    def __init__(self, variables: Dict[str, Any], num_classes: int,
                 use_pallas: bool = False, dw_shifted: bool = False,
                 torch_pad: bool = False, use_qivr: bool = False,
                 qivr_interpret: bool = False):
        super().__init__(variables, num_classes, use_pallas=use_pallas,
                         dw_shifted=dw_shifted, torch_pad=torch_pad)
        self.use_qivr = use_qivr
        self.qivr_interpret = qivr_interpret
        if use_qivr:
            self._prepare_qivr()

    def _prepare_qivr(self) -> None:
        """Stack each maximal identity-inverted-residual run for qivr_fused.

        Block i qualifies when it has an expand conv, stride 1, cin == cout
        (residual present) and all grids affine; the grid AFTER the run
        (next block's in-grid, or the head's) must be affine too — the same
        dispatch rule as ResNet's qstage applied to inverted residuals.
        """
        from qtpu.ops.pallas.qivr import ivr_coeffs, stack_ivr_weights
        from qtpu.serve.fused_ops import unpacked_kernel

        blocks = self._blocks()

        def chainable(j):
            name, _t, stride = blocks[j]
            nodes = tuple(self._node(name, k)
                          for k in ("expand", "dw", "project"))
            if any(n is None for n in nodes) or stride != 1:
                return None
            cin = unpacked_kernel(nodes[0]).shape[-2]
            cout = unpacked_kernel(nodes[2]).shape[-1]
            if cin != cout or any(_grid_of(n)[2] for n in nodes):
                return None
            return nodes

        i = 0
        while i < len(blocks):
            run = []
            j = i
            while j < len(blocks):
                nodes = chainable(j)
                if nodes is None:
                    break
                run.append(nodes)
                j += 1
            if not run:
                i += 1
                continue
            tgt = (self._block_in_grid(blocks[j][0]) if j < len(blocks)
                   else _grid_of(self._node("head")))
            if not tgt[2]:               # affine consumer only
                self._qivr_prep[i] = dict(
                    nrun=len(run), tgt=tgt,
                    weights=stack_ivr_weights(run),
                    coeffs=ivr_coeffs(run, (tgt[0], tgt[1])))
            i = j

    def _qivr(self, x_q: Array, i: int) -> Array:
        from qtpu.ops.pallas.qivr import qivr_fused

        prep = self._qivr_prep[i]
        B, H, W, C = x_q.shape
        out = qivr_fused(
            x_q.reshape(B * H * W, C), **prep["weights"], **prep["coeffs"],
            h=H, w=W, interpret=self.qivr_interpret)
        return out.reshape(B, H, W, C)

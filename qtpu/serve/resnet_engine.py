"""Hand-scheduled int8 ResNet inference engine (the images/sec bench target).

The module-level SERVE path (qtpu.nn layers) dequantizes to f32 between every
layer — correct and general, but it leaves fusion on the table.  This engine
runs ResNet-18/50 from the frozen ``qweights`` tree (``qtpu.transform.freeze``
output) as a flat int8-resident pipeline (SURVEY.md §3.5 target shape):

* 1×1 convolutions run as Pallas fused GEMMs (``qmatmul_fused``) with the
  ReLU + affine requantization epilogue fused — activations stay int8 across
  the bottleneck chain, quantized on each consumer's calibrated grid;
* K×K convolutions use XLA's int8 MXU conv (measured 75-81% peak for the
  Ci≥128 3×3s) with the dequant+relu+requant epilogue fused by XLA;
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

from qtpu.ops import fakequant as fq
from qtpu.ops import qops
from qtpu.ops.pallas.qmatmul import qmatmul_fused

Array = jax.Array
Grid = Tuple[Array, Array]  # (act_scale f32, act_zp int32 signed)


def _unpacked_kernel(node: Dict[str, Array]) -> Array:
    """int8 weights of a frozen node, unpacking int4 nibbles if needed."""
    w = node["kernel_q"]
    if w.shape[-1] != node["colsum"].shape[0]:   # int4 nibble-packed
        w = fq.unpack_int4(w, axis=-1)
    return w


def _best_tile(n: int, candidates=(1024, 512, 256, 128, 64, 32, 16, 8)) -> int:
    for c in candidates:
        if n % c == 0:
            return c
    return n


def _grid_of(node: Dict[str, Array]) -> Grid:
    return node["act_scale"], node["act_zp"]


class ResNetInt8Engine:
    """Flat int8 inference over frozen ResNet qweights.

    ``arch``: dict(stage_sizes, width, bottleneck, cifar_stem, num_classes).
    ``variables``: freeze() output.  All layers must be quantized (use the
    module SERVE path for models with excluded layers).
    """

    def __init__(self, variables: Dict[str, Any], arch: Dict[str, Any],
                 use_pallas: bool = True, min_ci_pallas: int = 64):
        self.qw = variables["qweights"]
        self.arch = dict(arch)
        self.use_pallas = use_pallas
        # Pallas GEMMs win for K >= this channel count; thinner contractions
        # (half-empty MXU) go to XLA whose conv fusion handles them better.
        self.min_ci_pallas = min_ci_pallas
        self.forward = jax.jit(self._forward)
        # int8 ingest: images pre-quantized on the host onto the stem's grid
        # (qtpu.data.native.preprocess_quantize) — 4x less transfer.
        self.forward_codes = jax.jit(
            lambda xq: self._forward(xq, pre_quantized=True))

    def stem_grid(self) -> Grid:
        """The (scale, zp) grid host-side ingest must quantize onto."""
        return _grid_of(self._node("stem"))

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

    # -- fused layer primitives ------------------------------------------

    def _gemm(self, x_q: Array, node: Dict[str, Array], *, relu: bool,
              requant: Optional[Grid], out_dtype,
              residual: Optional[Array] = None,
              res_grid: Optional[Grid] = None) -> Array:
        B, H, W, Ci = x_q.shape
        w = _unpacked_kernel(node)
        w = w.reshape(w.shape[-2:])
        Co = w.shape[-1]
        M = B * H * W
        rs, rz = (requant if requant is not None else (None, None))
        if (self.use_pallas and M % 32 == 0 and Co % 32 == 0
                and Ci % 64 == 0 and Ci >= self.min_ci_pallas):
            res2 = (residual.reshape(M, Co) if residual is not None else None)
            res_s = res_grid[0] if res_grid is not None else None
            res_z = (res_grid[1].astype(jnp.float32)
                     if res_grid is not None else None)
            y = qmatmul_fused(
                x_q.reshape(M, Ci), w,
                act_scale=node["act_scale"], act_zp=node["act_zp"],
                w_scale=node["w_scale"], colsum=node["colsum"],
                bias=node["bias"], requant_scale=rs, requant_zp=rz, relu=relu,
                residual=res2, res_scale=res_s, res_zp=res_z,
                bm=_best_tile(M), bn=_best_tile(Co, (512, 256, 128, 64, 32)),
                bk=min(Ci, 4096), out_dtype=out_dtype)
            return y.reshape(B, H, W, Co)
        acc = qops.qmatmul(x_q.reshape(M, Ci), w)
        y = qops.dequant_epilogue(acc, act_scale=node["act_scale"],
                                  act_zp=node["act_zp"],
                                  w_scale=node["w_scale"],
                                  colsum=node["colsum"], bias=node["bias"])
        if residual is not None:
            r = residual.reshape(M, Co)
            if r.dtype == jnp.int8:
                r = (r.astype(jnp.float32)
                     - res_grid[1].astype(jnp.float32)) * res_grid[0]
            y = y + r
        if relu:
            y = jnp.maximum(y, 0.0)
        if requant is not None:
            y = qops.quantize_act(y, rs, rz)
        return y.reshape(B, H, W, -1)

    def _conv_xla(self, x_q: Array, node: Dict[str, Array], *, strides,
                  relu: bool, requant: Optional[Grid]) -> Array:
        acc = qops.qconv2d(x_q, _unpacked_kernel(node), strides=strides,
                           padding="SAME", zp=node["act_zp"])
        y = qops.dequant_epilogue(acc, act_scale=node["act_scale"],
                                  act_zp=node["act_zp"],
                                  w_scale=node["w_scale"],
                                  colsum=node["colsum"], bias=node["bias"])
        if relu:
            y = jnp.maximum(y, 0.0)
        if requant is None:
            return y
        return qops.quantize_act(y, requant[0], requant[1])

    @staticmethod
    def _dequant(x_q: Array, grid: Grid) -> Array:
        s, zp = grid
        return (x_q.astype(jnp.float32) - zp.astype(jnp.float32)) * s

    # -- network ----------------------------------------------------------

    def _stem(self, x: Array, first_grid: Grid,
              pre_quantized: bool = False) -> Array:
        node = self._node("stem")
        if node is None:
            raise NotImplementedError(
                "excluded stem: use the module SERVE path")
        cifar = self.arch.get("cifar_stem", False)
        strides = (1, 1) if cifar else (2, 2)
        if pre_quantized:
            x_q = x                      # already on the stem's grid (int8)
        else:
            x_q = qops.quantize_act(x, node["act_scale"], node["act_zp"])
        y_q = self._conv_xla(x_q, node, strides=strides, relu=True,
                             requant=first_grid)
        if not cifar:
            y_q = jax.lax.reduce_window(
                y_q, jnp.int8(-128), jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
                "SAME")
        return y_q

    def _bottleneck(self, x_q: Array, x_grid: Grid, name: str,
                    strides, next_grid: Grid) -> Array:
        c1, c2, c3 = (self._node(name, k) for k in ("conv1", "conv2", "conv3"))
        down = self._node(name, "down")
        a = self._gemm(x_q, c1, relu=True, requant=_grid_of(c2),
                       out_dtype=jnp.int8)
        b = self._conv_xla(a, c2, strides=strides, relu=True,
                           requant=_grid_of(c3))
        if down is not None:
            res = self._gemm(x_q[:, ::strides[0], ::strides[1], :], down,
                             relu=False, requant=None, out_dtype=jnp.float32)
            res_grid = None          # f32 residual (4 blocks only)
        else:
            res = x_q                # int8 codes reused: zero extra traffic
            res_grid = x_grid
        # project 1x1 with residual add + relu + requant fused in the epilogue
        return self._gemm(b, c3, relu=True, requant=next_grid,
                          out_dtype=jnp.int8, residual=res,
                          res_grid=res_grid)

    def _basic(self, x_q: Array, x_grid: Grid, name: str, strides,
               next_grid: Grid) -> Array:
        c1, c2 = (self._node(name, k) for k in ("conv1", "conv2"))
        down = self._node(name, "down")
        a = self._conv_xla(x_q, c1, strides=strides, relu=True,
                           requant=_grid_of(c2))
        b = self._conv_xla(a, c2, strides=(1, 1), relu=False, requant=None)
        if down is not None:
            r = self._gemm(x_q[:, ::strides[0], ::strides[1], :], down,
                           relu=False, requant=None, out_dtype=jnp.float32)
        else:
            r = self._dequant(x_q, x_grid)
        y = jnp.maximum(b + r, 0.0)
        return qops.quantize_act(y, next_grid[0], next_grid[1])

    def _forward(self, x: Array, pre_quantized: bool = False) -> Array:
        bottleneck = self.arch.get("bottleneck", True)
        names = self._block_names()
        first = self._node(names[0][0], "conv1")
        fc = self._node("fc")
        if fc is None:
            raise NotImplementedError("excluded fc: use the module SERVE path")
        x_q = self._stem(x, _grid_of(first), pre_quantized=pre_quantized)
        grid = _grid_of(first)
        for idx, (name, i, j) in enumerate(names):
            strides = (2, 2) if (i > 0 and j == 0) else (1, 1)
            if idx + 1 < len(names):
                nxt = _grid_of(self._node(names[idx + 1][0], "conv1"))
            else:
                nxt = _grid_of(fc)
            step = self._bottleneck if bottleneck else self._basic
            x_q = step(x_q, grid, name, strides, nxt)
            grid = nxt
        pooled = jnp.mean(self._dequant(x_q, grid), axis=(1, 2))
        x_fc_q = qops.quantize_act(pooled, fc["act_scale"], fc["act_zp"])
        acc = qops.qmatmul(x_fc_q, _unpacked_kernel(fc))
        return qops.dequant_epilogue(
            acc, act_scale=fc["act_scale"], act_zp=fc["act_zp"],
            w_scale=fc["w_scale"], colsum=fc["colsum"], bias=fc["bias"])

"""Device mesh + sharding rules for the quantized serving/training runtime.

The reference is single-process single-device with no parallelism or comm
backend (SURVEY.md §2.3 [K-high]; mount empty, §0).  The north star [B] demands
a multi-host runtime: quantized weights tensor-sharded over the mesh, requests
batched across hosts, ICI collectives overlapped with int8 compute.  The
TPU-native mechanism is jax.sharding + GSPMD:

* mesh axes ``('data', 'model')`` — DP over ``data`` (requests/batches),
  TP over ``model`` (conv output channels / dense columns, with the matching
  per-channel scales/colsums/biases sharded identically);
* activations constrained to ``P('data', ...)``; XLA's SPMD partitioner
  inserts the all-gathers/reduce-scatters over ICI and its latency-hiding
  scheduler overlaps them with the int8 convolutions (SURVEY.md §5.8);
* excluded-layer fp32 params and scalar thresholds are replicated.

Works identically on a real pod slice and on the 8-virtual-device CPU mesh
used by tests (SURVEY.md §4.2 "multi-device without a cluster").
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(dp: Optional[int] = None, tp: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        if n % tp:
            raise ValueError(f"{n} devices not divisible by tp={tp}")
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp*tp = {dp}*{tp} != {n} devices")
    arr = np.array(devices).reshape(dp, tp)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def _qweight_leaf_spec(name: str, leaf: jax.Array) -> P:
    """Sharding rule for one leaf of the qweights collection.

    Integer kernels are sharded over their output-channel (last) axis — this
    also covers the int4 nibble-packed layout, which packs along that same
    axis.  Per-channel vectors follow; scalars replicate.
    """
    if name == "kernel_q":
        return P(*([None] * (leaf.ndim - 1) + [MODEL_AXIS]))
    if name in ("w_scale", "colsum", "bias") and leaf.ndim == 1:
        return P(MODEL_AXIS)
    return P()  # act_scale / act_zp / per-tensor w_scale: replicated


def serve_variable_specs(serve_vars: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpec pytree for frozen serving variables (TP over 'model')."""

    def spec_qweights(tree):
        out = {}
        for k, v in tree.items():
            if hasattr(v, "items"):
                out[k] = spec_qweights(v)
            else:
                out[k] = _qweight_leaf_spec(k, v)
        return out

    specs: Dict[str, Any] = {}
    for col, tree in serve_vars.items():
        if col == "qweights":
            specs[col] = spec_qweights(tree)
        else:
            # fp32 params of excluded layers etc.: replicated
            specs[col] = jax.tree.map(lambda _: P(), tree)
    return specs


def serve_shardings(serve_vars: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """NamedSharding pytree for the serving variables over ``mesh``.

    Kernels whose output-channel axis does not divide by the 'model' axis size
    fall back to replication (first conv stems with few channels etc.).
    Shared by :func:`shard_variables` (placement) and the AOT overlap-evidence
    tool (qtpu.bench.overlap), which compiles against an abstract topology.
    """
    specs = serve_variable_specs(serve_vars)
    tp = mesh.shape[MODEL_AXIS]

    def resolve(leaf, spec):
        if any(ax == MODEL_AXIS for ax in spec):
            dim = [i for i, ax in enumerate(spec) if ax == MODEL_AXIS][0]
            if leaf.shape[dim] % tp:
                spec = P()
        return NamedSharding(mesh, spec)

    return jax.tree.map(resolve, serve_vars, specs)


def shard_variables(serve_vars: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """device_put the serving variables with TP shardings over the mesh."""
    return jax.tree.map(jax.device_put, serve_vars,
                        serve_shardings(serve_vars, mesh))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Input batches: sharded over 'data', replicated over 'model'."""
    return NamedSharding(mesh, P(DATA_AXIS))

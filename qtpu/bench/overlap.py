"""Collective/compute overlap evidence via chipless multi-chip AOT compiles.

SURVEY.md §7.2: the ≥85% multi-host scaling target needs proof that ICI
collectives hide under int8 compute.  This environment has ONE chip, but the
axon tunnel's TPU compiler is *chipless* (TpuAotCompiler): it accepts any
topology description, so the real SPMD partitioner + latency-hiding
scheduler can be run for a multi-chip v5e slice and the optimized HLO
inspected — genuine backend evidence, not a CPU approximation.

``python -m qtpu.bench.overlap [model] [batch] [topology]`` compiles the
TP-sharded integer serving forward (the config-4 path: qweights sharded on
output channels via qtpu.parallel.serve_shardings) for a v5e:2x2x1 slice and
prints a report:

* collectives by HLO op (all-reduce / all-gather / reduce-scatter /
  collective-permute) with the backend's chosen emitter+strategy (e.g.
  ``RotatedPincerEmitter / UniDirection1DRingStrategy`` — the ICI ring);
* async pairs (``*-start``/``*-done``, incl. async copies/slices) and how
  many compute fusions the scheduler placed BETWEEN start and done — the
  overlap the latency-hiding scheduler bought;
* the full HLO is saved for inspection.

Measured 2026-08-18 (resnet18, B=64, v5e:2x2x1): see PARITY.md §overlap.
"""
from __future__ import annotations

import json
import re
import sys
from collections import Counter
from typing import Any, Dict, Optional

import jax
import numpy as np

_COLL = r"(?:all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)"


def aot_topology_mesh(topology: str = "v5e:2x2x1", dp: int = 2, tp: int = 2,
                      axes=("data", "model")):
    """Mesh over an AOT TopologyDescription's devices (default 2×2 DP×TP)."""
    from jax.experimental import topologies
    from jax.sharding import Mesh

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name=topology)
    devs = np.array(topo.devices)
    if len(axes) == 1:
        return Mesh(devs.reshape(-1), axes)
    assert devs.size == dp * tp, (devs.size, dp, tp)
    return Mesh(devs.reshape(dp, tp), axes)


def compile_tp_serve(model_name: str = "resnet18", batch: int = 64,
                     mesh=None, image: int = 32) -> str:
    """AOT-compile the TP+DP sharded integer serving forward; return HLO."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from qtpu.models import get_model
    from qtpu.nn import QuantPolicy
    from qtpu.parallel.mesh import serve_shardings
    from qtpu.transform import calibrate, convert_model, freeze

    if mesh is None:
        mesh = aot_topology_mesh()
    key = jax.random.PRNGKey(0)
    m = get_model(model_name, num_classes=100, cifar_stem=image <= 64)
    x0 = jax.random.normal(key, (8, image, image, 3))
    qm = convert_model(m, QuantPolicy.int8_ptq())
    qv = dict(jax.jit(qm.init, static_argnames="train")(key, x0, train=True))
    qv = calibrate(qm, qv, [x0])
    sm, sv = freeze(qm, qv, x0)

    shardings = serve_shardings(sv, mesh)
    sv_shaped = jax.tree.map(
        lambda leaf, s: jax.ShapeDtypeStruct(leaf.shape, leaf.dtype,
                                             sharding=s),
        sv, shardings)
    x_shaped = jax.ShapeDtypeStruct(
        (batch, image, image, 3), np.float32,
        sharding=NamedSharding(mesh, P("data")))
    return jax.jit(sm.apply).lower(sv_shaped, x_shaped).compile().as_text()


def compile_spatial_chain(topology: str = "v5e:2x2x1", batch: int = 8,
                          image: int = 224) -> str:
    """AOT-compile the spatially-sharded int8 stem chain; return HLO.

    Halo exchanges lower to ``collective-permute`` over the 'spatial' axis —
    the report shows them as point-to-point ICI transfers (a handful of rows
    each), NOT all-gathers of the activation.
    """
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from qtpu.parallel.spatial import (spatial_conv2d, spatial_max_pool,
                                       spatial_sharding)

    mesh = aot_topology_mesh(topology, dp=2, tp=2, axes=("data", "spatial"))

    def fwd(x, w1, w2):
        y = spatial_conv2d(x, w1, mesh, strides=(2, 2))
        y = jnp.clip(y // 256, -128, 127).astype(jnp.int8)
        y = spatial_max_pool(y, mesh)
        return spatial_conv2d(y, w2, mesh)

    rep = NamedSharding(mesh, P())
    x = jax.ShapeDtypeStruct((batch, image, image, 3), np.int8,
                             sharding=spatial_sharding(mesh))
    w1 = jax.ShapeDtypeStruct((7, 7, 3, 64), np.int8, sharding=rep)
    w2 = jax.ShapeDtypeStruct((3, 3, 64, 64), np.int8, sharding=rep)
    return jax.jit(fwd).lower(x, w1, w2).compile().as_text()


def compile_pipeline(topology: str = "v5e:2x2x1", n_micro: int = 8,
                     d: int = 512) -> str:
    """AOT-compile the GPipe pipeline program (4 stages over the slice)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from qtpu.ops import qops
    from qtpu.parallel.pipeline import pipeline_apply, stage_sharding

    mesh = aot_topology_mesh(topology, axes=("pipe",))
    n = mesh.shape["pipe"]

    def stage(w, xq):
        return jnp.clip(qops.qmatmul(xq, w) // 64, -128, 127).astype(jnp.int8)

    def fwd(ws, xm):
        return pipeline_apply(stage, ws, xm, mesh)

    ws = jax.ShapeDtypeStruct((n, d, d), np.int8,
                              sharding=stage_sharding(mesh))
    xm = jax.ShapeDtypeStruct((n_micro, 8, d), np.int8,
                              sharding=NamedSharding(mesh, P()))
    return jax.jit(fwd).lower(ws, xm).compile().as_text()


def collective_report(hlo: str) -> Dict[str, Any]:
    """Parse optimized HLO into the overlap-evidence summary."""
    lines = hlo.splitlines()
    colls = Counter(re.findall(rf"\b({_COLL})(?:-start)?\(", hlo))
    emitters = Counter(re.findall(r'"emitter":"(\w+)"', hlo))
    strategies = Counter(re.findall(r'"strategy":"(\w+)"', hlo))
    pairs = []
    for i, ln in enumerate(lines):
        mstart = re.search(r"%(\S+?)-start(?:\.\d+)? = ", ln)
        if not mstart:
            continue
        kind = mstart.group(1).split("%")[-1]
        for j in range(i + 1, len(lines)):
            if re.search(rf"{kind}-done", lines[j]):
                between = lines[i + 1:j]
                compute = sum(1 for b in between
                              if re.search(r"(fusion|convolution|dot)\(", b))
                pairs.append(dict(kind=kind, line=i, done=j,
                                  instrs_between=len(between),
                                  compute_between=compute))
                break
    return dict(
        collectives=dict(colls),
        collective_emitters=dict(emitters),
        collective_strategies=dict(strategies),
        async_pairs=len(pairs),
        async_pairs_with_compute_between=sum(
            1 for p in pairs if p["compute_between"] > 0),
        pairs=pairs[:12],
    )


def main(argv: Optional[list] = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    model = argv[0] if argv else "resnet18"
    batch = int(argv[1]) if len(argv) > 1 else 64
    topology = argv[2] if len(argv) > 2 else "v5e:2x2x1"
    if model == "spatial":
        hlo = compile_spatial_chain(topology, batch)
    elif model == "pipeline":
        hlo = compile_pipeline(topology, batch)
    else:
        hlo = compile_tp_serve(model, batch, aot_topology_mesh(topology))
    path = f"/tmp/qtpu_overlap_{model}_{topology.replace(':', '_')}.hlo"
    with open(path, "w") as f:
        f.write(hlo)
    rep = collective_report(hlo)
    rep["hlo_path"] = path
    rep["model"], rep["batch"], rep["topology"] = model, batch, topology
    print(json.dumps(rep, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Pipeline parallelism — stage-partitioned inference over a 'pipe' mesh axis.

SURVEY.md §2.3 lists PP as optional/stretch for the build (the reference is
single-device, [K-high]; mount empty, §0).  Rounds 1-2 documented the
omission; this module implements the mechanism so stage partitioning is
available when a model's weights outgrow one chip's HBM (int4 ResNets do
not — TP+DP covers them — but the runtime should not hard-code that).

TPU-native shape (GPipe schedule as a single SPMD program):

* stage weights stacked on a leading axis and sharded ``P('pipe')`` — device
  i holds exactly stage i's weights, nothing is replicated;
* a ``lax.scan`` over ``n_micro + n_stages − 1`` ticks; each tick every
  device runs the SAME ``stage_fn`` (uniform program — XLA compiles one
  body) on the activation it received, then shifts its output one hop right
  with ``lax.ppermute`` — a neighbor ICI transfer, never a broadcast;
* device 0 feeds microbatch ``t`` at tick ``t``; device n−1's outputs from
  tick ``n−1`` onward are the results, replicated to all devices with a
  masked ``psum``.

The pipeline bubble is the usual ``(n_stages−1) / (n_micro + n_stages−1)``
idle fraction: utilization → 1 as microbatches ≫ stages.  Stages must be
shape-homogeneous (same activation in/out shape) — the natural CNN unit is
a residual block within a stage; heterogeneous whole-network partitions
need per-boundary reshapes, which is exactly the regime SURVEY §2.3 scoped
out for CNN serving (TP+DP fills the mesh first).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array
PIPE_AXIS = "pipe"


def make_pipeline_mesh(stages: int,
                       devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """One-axis ('pipe',) mesh with one device per stage."""
    devices = list(devices if devices is not None else jax.devices())
    if stages != len(devices):
        raise ValueError(f"{stages} stages != {len(devices)} devices")
    return Mesh(np.array(devices), (PIPE_AXIS,))


def stage_sharding(mesh: Mesh) -> NamedSharding:
    """Stacked stage weights: leading (stage) axis over 'pipe'."""
    return NamedSharding(mesh, P(PIPE_AXIS))


def pipeline_apply(stage_fn: Callable[[Any, Array], Array],
                   stage_params: Any, x_micro: Array, mesh: Mesh) -> Array:
    """Run ``n_micro`` microbatches through ``n_stages`` pipelined stages.

    ``stage_fn(params_i, x) -> y`` applies one stage (y.shape == x.shape);
    ``stage_params``: pytree whose leaves have leading dim n_stages, sharded
    with :func:`stage_sharding` (or unplaced — shard_map partitions it);
    ``x_micro``: (n_micro, mb, ...) microbatched input, replicated.

    Returns (n_micro, mb, ...) outputs, replicated over the mesh.
    """
    n = mesh.shape[PIPE_AXIS]
    n_micro = x_micro.shape[0]
    ticks = n_micro + n - 1
    pad = jnp.zeros((n - 1, *x_micro.shape[1:]), x_micro.dtype)
    xs = jnp.concatenate([x_micro, pad]) if n > 1 else x_micro

    def local(params, xs_l):
        p = jax.tree.map(lambda a: a[0], params)   # this device's stage
        idx = jax.lax.axis_index(PIPE_AXIS)
        # inputs arrive replicated; the carried activation is device-varying
        # (each device holds a different microbatch in flight) — promote both
        # so scan's carry type is stable under shard_map's vma checking.
        xs_l = jax.lax.pcast(xs_l, PIPE_AXIS, to="varying")

        def tick(act, x_t):
            recv = (jax.lax.ppermute(act, PIPE_AXIS,
                                     [(j, j + 1) for j in range(n - 1)])
                    if n > 1 else act)
            x_in = jnp.where(idx == 0, x_t, recv)
            y = stage_fn(p, x_in)
            return y, y

        _, ys = jax.lax.scan(tick, jnp.zeros_like(xs_l[0]), xs_l)
        out = ys[n - 1:ticks]                       # last stage's exits
        out = jnp.where(idx == n - 1, out, jnp.zeros_like(out))
        return jax.lax.psum(out, PIPE_AXIS)

    return jax.shard_map(local, mesh=mesh, in_specs=(P(PIPE_AXIS), P()),
                         out_specs=P())(stage_params, xs)

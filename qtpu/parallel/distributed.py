"""Multi-host process bring-up + collective/compute overlap flags.

The reference is single-process (SURVEY.md SS2.3 [K-high]; mount empty, SS0);
the north star [B] demands "continuous batching of inference requests across
hosts".  TPU-native multi-host SPMD needs exactly two pieces of runtime glue,
both here:

1. ``initialize_from_env()`` — guarded ``jax.distributed.initialize()``
   (SURVEY.md SS5.8).  Reads the standard coordinator env vars and degrades
   to a no-op single-process setup when they are absent, so every entry
   point can call it unconditionally.  On Cloud TPU pods with the TPU
   runtime, ``jax.distributed.initialize()`` auto-discovers everything; the
   env vars are for CPU/GPU-style bring-up and tests.

2. ``overlap_xla_flags()`` / ``enable_overlap_flags()`` — the XLA
   latency-hiding-scheduler flags that let async collective all-gathers /
   reduce-scatters overlap with int8 conv compute (SURVEY.md SS5.8, SS7.2).
   Must be applied before the first backend initialization.

Cross-host data movement for serving: each process owns the requests it
received; ``local_batch_to_global()`` assembles a global sharded batch from
per-process local shards (the continuous-batching scheduler feeds its local
slice only — no host ever materializes the global batch).
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np

# Async-collective + latency-hiding scheduler flags (TPU).  These are
# **libtpu init args**, NOT XLA_FLAGS: measured on this stack (libtpu
# 0.0.34 via axon, 2026-08-18), putting any --xla_tpu_* flag in XLA_FLAGS
# makes the client-side flag parser abort the process
# ("F parse_flags_from_env.cc: Unknown flags in XLA_FLAGS"), so they must
# ride LIBTPU_INIT_ARGS, which the TPU runtime parses itself.  XLA enables
# async collectives by default on TPU; these make the overlap policy
# explicit for the TP/DP shardings in qtpu.parallel.mesh.
OVERLAP_LIBTPU_FLAGS = (
    "--xla_tpu_enable_async_collective_fusion=true",
    "--xla_tpu_enable_async_collective_fusion_fuse_all_gather=true",
    "--xla_tpu_enable_async_collective_fusion_multiple_steps=true",
    "--xla_tpu_overlap_compute_collective_tc=true",
)

# Backwards-compat alias (round-1 name); same tuple, see note above.
OVERLAP_XLA_FLAGS = OVERLAP_LIBTPU_FLAGS


def enable_overlap_flags() -> None:
    """Append the overlap flags to LIBTPU_INIT_ARGS (idempotent).

    Call before jax initializes a backend (i.e. before the first
    computation), typically at serve-CLI entry.  No-op for flags already
    present so repeated calls / user overrides are safe.  Round-1 put these
    in XLA_FLAGS, which fatally aborts the process on this libtpu (see the
    OVERLAP_LIBTPU_FLAGS note) — they belong in LIBTPU_INIT_ARGS.
    """
    flags = os.environ.get("LIBTPU_INIT_ARGS", "")
    add = [f for f in OVERLAP_LIBTPU_FLAGS if f.split("=")[0] not in flags]
    if add:
        os.environ["LIBTPU_INIT_ARGS"] = (flags + " " + " ".join(add)).strip()


_initialized = False


def initialize_from_env(coordinator: Optional[str] = None,
                        num_processes: Optional[int] = None,
                        process_id: Optional[int] = None) -> bool:
    """Multi-host bring-up; returns True if distributed mode is active.

    Resolution order: explicit args > ``QTPU_COORDINATOR`` /
    ``QTPU_NUM_PROCESSES`` / ``QTPU_PROCESS_ID`` env vars > single-process
    no-op.  Safe to call more than once (subsequent calls return the
    current state).
    """
    global _initialized
    if _initialized:
        return jax.process_count() > 1
    coordinator = coordinator or os.environ.get("QTPU_COORDINATOR")
    if coordinator is None:
        return False     # single-process: nothing to do, jax defaults apply
    num_processes = int(num_processes
                        or os.environ.get("QTPU_NUM_PROCESSES", "1"))
    process_id = int(process_id
                     if process_id is not None
                     else os.environ.get("QTPU_PROCESS_ID", "0"))
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    _initialized = True
    return num_processes > 1


def local_batch_to_global(local: np.ndarray, sharding) -> jax.Array:
    """Assemble a globally-sharded batch from this process's local shard.

    ``local`` is the (B_local, ...) slice this host's scheduler packed;
    ``sharding`` a NamedSharding over the global mesh with the batch dim on
    'data'.  Every process must call this collectively with equal shapes.
    Single-process meshes take the fast path (plain device_put).
    """
    if jax.process_count() == 1:
        return jax.device_put(local, sharding)
    return jax.make_array_from_process_local_data(sharding, local)


def process_local_devices(mesh_devices: Sequence[jax.Device]):
    """The subset of mesh devices owned by this process (addressable)."""
    return [d for d in mesh_devices
            if d.process_index == jax.process_index()]

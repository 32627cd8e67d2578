"""Checkpoint / resume via orbax (SURVEY.md §5.3-§5.4).

The reference only has Gluon ``save_parameters`` in examples [K-med]; the
build mandates restartable QAT state and shard-aware serving weights.  Orbax
handles both: pytrees of jax arrays (params + opt state + quant thresholds)
and the frozen integer ``qweights`` tree.  On restore into a sharded mesh,
pass ``target`` arrays with the desired shardings (orbax restores to match).

Minimal-viable failure recovery (SURVEY.md §5.3): checkpoint every N steps,
restart the process, ``load`` + continue.  Elastic resize is out of scope v1.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax


def save(path: str, tree: Any, *, force: bool = True) -> None:
    """Save a pytree of arrays (TrainState.variables(), serve_vars, ...)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=force)
    ckptr.wait_until_finished()


def load(path: str, target: Optional[Any] = None) -> Any:
    """Restore a pytree. ``target`` (abstract or concrete) pins structure,
    dtypes, and shardings; without it the stored structure is returned."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if target is None:
        return ckptr.restore(path)
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                       sharding=getattr(x, "sharding", None))
        if hasattr(x, "shape") else x, target)
    return ckptr.restore(path, abstract)

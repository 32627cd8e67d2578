"""Mesh, shardings, and collectives for multi-device/multi-host execution."""
from qtpu.parallel.mesh import (DATA_AXIS, MODEL_AXIS, batch_sharding,
                                make_mesh, serve_variable_specs,
                                shard_variables)

__all__ = ["DATA_AXIS", "MODEL_AXIS", "batch_sharding", "make_mesh",
           "serve_variable_specs", "shard_variables"]

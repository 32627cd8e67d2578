"""Mesh, shardings, and collectives for multi-device/multi-host execution."""
from qtpu.parallel.distributed import (enable_overlap_flags,
                                       initialize_from_env,
                                       local_batch_to_global)
from qtpu.parallel.mesh import (DATA_AXIS, MODEL_AXIS, batch_sharding,
                                make_mesh, serve_variable_specs,
                                shard_variables)
from qtpu.parallel.pipeline import (PIPE_AXIS, make_pipeline_mesh,
                                    pipeline_apply, stage_sharding)
from qtpu.parallel.spatial import (SPATIAL_AXIS, make_spatial_mesh,
                                   spatial_conv2d, spatial_max_pool,
                                   spatial_sharding)

__all__ = ["DATA_AXIS", "MODEL_AXIS", "PIPE_AXIS", "SPATIAL_AXIS",
           "batch_sharding", "make_mesh", "serve_variable_specs",
           "shard_variables", "enable_overlap_flags", "initialize_from_env",
           "local_batch_to_global", "make_pipeline_mesh", "pipeline_apply",
           "stage_sharding", "make_spatial_mesh", "spatial_conv2d",
           "spatial_max_pool", "spatial_sharding"]

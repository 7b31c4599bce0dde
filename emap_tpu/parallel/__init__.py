from emap_tpu.parallel.mesh import (
    build_sharded_train_step,
    make_mesh,
    replicate,
    shard_rays_constraint,
)

__all__ = [
    "build_sharded_train_step",
    "make_mesh",
    "replicate",
    "shard_rays_constraint",
]

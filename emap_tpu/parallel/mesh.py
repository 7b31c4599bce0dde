"""Multi-chip data parallelism over rays.

The reference is strictly single-GPU (SURVEY.md §2.4: no torch.distributed
anywhere). The TPU-native scaling axis for a per-scene NeRF-style workload is
the ray batch: parameters replicate, rays shard, and the parameter-gradient
reduction rides ICI as an XLA-inserted psum.

Implementation: GSPMD through jit -- `build_train_step(..., mesh=mesh)` adds a
sharding constraint on the sampled ray batch and XLA partitions the
render/backward along the ray axis automatically. No pmap, no manual
collectives; the same program runs on 1 chip or N.

The per-ray sample axis (the transmittance cumprod scans) stays local to a
chip by construction; never shard it (SURVEY.md §5).
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(devices, (axis,))


def replicate(tree, mesh: Mesh):
    """Place a pytree fully replicated on the mesh."""
    return jax.device_put(tree, NamedSharding(mesh, P()))


def shard_rays_constraint(batch, mesh: Mesh, axis: str = DATA_AXIS):
    """Constrain every per-ray array to be sharded along the ray axis."""

    def constrain(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    return jax.tree.map(constrain, batch)


def build_sharded_train_step(tcfg, rcfg, ucfg, n_images, mesh: Mesh,
                             axis: str = DATA_AXIS, donate=None):
    """Ray-sharded train step: see emap_tpu.train.step.build_train_step."""
    from emap_tpu.train.step import build_train_step

    return build_train_step(tcfg, rcfg, ucfg, n_images, donate=donate,
                            mesh=mesh, axis=axis)

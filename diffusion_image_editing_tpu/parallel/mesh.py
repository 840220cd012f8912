"""Device-mesh helpers.

The reference's only distribution is NCCL DDP in BiSeNet training
(`src/Segmentation/train.py:47-52`); here the mesh is a first-class object:
data-parallel training, sharded batched edit sweeps, and synced-norm
collectives all hang off `jax.sharding.Mesh` axes with XLA-scheduled
collectives over ICI (multi-host: `jax.distributed.initialize` + DCN).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("data",),
    devices=None,
) -> Mesh:
    """Build a mesh over all (or given) devices; default 1-D 'data' axis."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (devices.size,) + (1,) * (len(axis_names) - 1)
    return Mesh(devices.reshape(shape), tuple(axis_names))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def shard_leading_axis(x, mesh: Mesh, axis: str = "data"):
    """Place an array (or pytree) with its leading axis split over `axis`."""
    s = data_sharded(mesh, axis)
    return jax.tree.map(lambda a: jax.device_put(a, s), x)


def initialize_distributed(**kwargs) -> None:
    """Multi-host initialization (DCN across slices): thin wrapper over
    `jax.distributed.initialize`. Single-host (this environment) is a no-op.
    The reference's equivalent is `dist.init_process_group('nccl', ...)`
    (`Segmentation/train.py:47-52`); in JAX the collectives themselves are
    compiler-scheduled — only process discovery needs initializing."""
    if jax.process_count() > 1:
        return  # already initialized
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError):
        pass  # single-process run

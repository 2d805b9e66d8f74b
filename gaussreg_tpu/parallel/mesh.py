"""Device mesh + sharding helpers.

TPU-native replacement for the reference's NCCL DDP setup
(reference: geotransformer/engine/base_trainer.py:63-86,179-194 and
geotransformer/utils/torch.py:16-34): instead of one process per GPU with
explicit all-reduce, a `jax.sharding.Mesh` over all chips with the batch
sharded along the `data` axis; XLA inserts (and overlaps) the gradient
all-reduce automatically under jit.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch_pytree(batch, mesh: Mesh):
    """Place every leaf of a batched pytree with its leading axis sharded
    across the mesh's data axis."""
    sharding = batch_sharded(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def process_local_batch_slice(global_batch_size: int) -> slice:
    """Which slice of the global batch this host should feed (multi-host
    data loading; reference's DistributedSampler equivalent,
    utils/torch.py:58-60)."""
    per = global_batch_size // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)

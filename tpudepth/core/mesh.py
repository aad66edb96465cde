"""Device mesh and sharding helpers.

The reference is strictly single-GPU (``.cuda()`` at ``src/train.py:34``;
no ``torch.distributed`` anywhere). Data parallelism here is a first-class,
new component: batches are sharded over the ``data`` axis of a
``jax.sharding.Mesh`` and XLA inserts the gradient all-reduce over ICI.

A second ``model`` axis is exposed for spatial sharding of large-resolution
inference (window attention is local, so H x W shards cleanly); the bundled
models are far smaller than one HBM so it defaults to size 1.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    num_data: int = 0,
    num_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create an (data, model) mesh.

    ``num_data=0`` uses all available devices on the data axis (divided by
    ``num_model``).
    """
    devices = list(devices if devices is not None else jax.devices())
    if num_data <= 0:
        num_data = len(devices) // num_model
    wanted = num_data * num_model
    if wanted > len(devices):
        raise ValueError(
            f"mesh ({num_data} x {num_model}) needs {wanted} devices, have {len(devices)}"
        )
    grid = np.asarray(devices[:wanted]).reshape(num_data, num_model)
    return Mesh(grid, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for [B, H, W, C] batches: B split over the 'data' axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of [B, ...] arrays sharded over the data axis."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """Shard [B, H, W, C] over batch *and* height.

    The attention in this model family is 7x7-window-local
    (``src/SAM.py:214-229``), so sharding H over the 'model' axis only
    requires halo exchange at conv boundaries, which XLA inserts
    automatically for sharded convolutions. This is the framework's
    sequence/context-parallel analogue for resolution scaling.
    """
    return NamedSharding(mesh, P("data", "model"))

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

import contextlib
import contextvars
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

#: Trace-time mesh handle: set while a train step is being traced so model
#: code can place sharding constraints (see :func:`despatialize`) without
#: threading the mesh through every module signature.
_CURRENT_MESH: contextvars.ContextVar[Optional[Mesh]] = contextvars.ContextVar(
    "tpudepth_current_mesh", default=None
)


@contextlib.contextmanager
def mesh_context(mesh: Optional[Mesh]):
    token = _CURRENT_MESH.set(mesh)
    try:
        yield
    finally:
        _CURRENT_MESH.reset(token)


def despatialize(x: jax.Array) -> jax.Array:
    """Drop spatial ('model'-axis) sharding from a [B, H, W, C] activation.

    Semantically the identity. Two reasons to call this on DEEP (low-
    resolution) stages when training under a (data, model) mesh:

    1. Correctness: XLA's SPMD partitioner MISCOMPILES the backward of
       pyramid-fusion patterns once a fused tensor's sharded height reaches
       one row per device (2-30x inflated gradient norms, forward correct —
       scripts/repro_spmd_grad_bug.py; upstream-ready issue writeup with the
       verified minimal workarounds: docs/xla_spmd_grad_bug.md). Constraining
       EITHER fuse operand to P('data') fixes it exactly; this helper applies
       it to the main branch, which also serves reason 2.
    2. Performance: at H/16 and below the per-device spatial shards are tiny
       and conv halo exchange dominates; deep stages are better replicated
       across the model axis anyway.

    No-op unless a mesh with a >1 'model' axis is in scope (trace-time
    context set by ``make_train_step(mesh=...)``).
    """
    mesh = _CURRENT_MESH.get()
    if mesh is None or mesh.shape.get("model", 1) <= 1:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P("data")))


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


def min_spatial_height(num_model: int, max_stride: int = 32) -> int:
    """Minimum input height for gradient-safe spatial sharding.

    Empirical finding (jax 0.9.0, CPU SPMD; scripts/repro_spmd_grad_bug.py):
    when a network stage's sharded height shrinks to exactly the model-axis
    size (one row per device) AND a sibling branch at even smaller height is
    resized up and fused into it (DDRNet's bilateral fusion / DAPPM shape),
    the XLA SPMD partitioner mis-scales the BACKWARD pass — gradient norms
    come out ~2-3x too large while the forward/loss stays bit-correct.
    Keeping every conv stage at >= 2 rows per device avoids the miscompiled
    path entirely, hence: H >= 2 * num_model * max_stride (max_stride = the
    deepest downsampling of the model family, /32 for DDRNet/GuideDepth).
    """
    return 2 * num_model * max_stride


def validate_spatial_input(h: int, mesh: Mesh, max_stride: int = 32) -> None:
    """Raise when training with spatial sharding would hit the partitioner's
    degenerate-shard gradient bug (see :func:`min_spatial_height`)."""
    num_model = mesh.shape.get("model", 1)
    if num_model > 1 and h < min_spatial_height(num_model, max_stride):
        raise ValueError(
            f"input height {h} is unsafe for spatial sharding over "
            f"{num_model} devices: gradients miscompile when the deepest "
            f"stage drops below 2 rows/device (need H >= "
            f"{min_spatial_height(num_model, max_stride)}; see "
            f"core/mesh.py:min_spatial_height)"
        )

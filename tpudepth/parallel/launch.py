"""Multi-host / multi-slice initialization helpers.

The reference is single-process, single-GPU (SURVEY.md §2c). This module is
the new distributed-runtime layer: on a multi-host TPU pod each host runs the
same program, calls :func:`initialize`, builds the global mesh from all
devices, and feeds its shard of the dataset (``NYUDepthDataset(shard=...,
num_shards=...)``). Gradient all-reduce rides ICI within a slice and DCN
across slices — XLA picks the transport from the mesh topology.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Initialize the jax distributed runtime when running multi-host.

    No-ops on single-process runs (the common case in this repo's CI and
    single-chip benches). On TPU pods the arguments are discovered from the
    environment automatically; they can be forced for DCN multislice.
    """
    if num_processes is not None and num_processes <= 1:
        return
    already = getattr(jax.distributed, "is_initialized", None)
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError):
        # single-process or already initialized
        pass


def host_shard_info():
    """(process_index, process_count) for per-host dataset sharding."""
    return jax.process_index(), jax.process_count()

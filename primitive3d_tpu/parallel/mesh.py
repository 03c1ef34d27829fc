"""Device-mesh helpers for multi-chip / multi-host scale-out.

The reference is single-process single-GPU (SURVEY.md §2.3: no distributed
anything); this layer is new TPU-first design. Axis convention:

  * ``data``  — embarrassingly parallel work items: ray batches, tet batches.
  * ``x``     — the spatial voxel-slab axis for sharded marching cubes.

Multi-host entry: call :func:`initialize_distributed` once per process (wraps
``jax.distributed.initialize``), then build meshes over ``jax.devices()`` —
shardings lay collectives over ICI within a slice and DCN across slices
exactly as XLA decides from the mesh.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host process setup (no-op when single-process)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(
    n_devices: Optional[int] = None, axis_name: str = "data"
) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), axis_names=(axis_name,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def sharded_along(mesh: Mesh, axis_name: str) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec(axis_name))

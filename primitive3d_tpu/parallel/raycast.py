"""Multi-chip ray casting: data-parallel rays, replicated geometry.

Rays are embarrassingly parallel (SURVEY.md §2.3): shard the ray batch over
the mesh's ``data`` axis, replicate triangles / BVH / MXU matrices (small
relative to HBM; all-gathered once over ICI by XLA at first use), and let
each chip cast its slice — zero inner communication; results come back
sharded the same way.
"""
from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from jax import shard_map

from ..raycast import RayCaster, RayHits


def make_sharded_cast(
    caster: RayCaster, mesh: Mesh, axis_name: str = "data"
) -> Callable:
    """Returns jitted ``cast(origins, dirs) -> RayHits`` with rays sharded
    over ``axis_name`` and geometry replicated. Ray count must divide evenly
    by the axis size (pad externally otherwise).

    Built on ``shard_map`` — each chip runs the caster on its local ray
    slice, so every backend works unchanged, including the Pallas kernels
    (which pjit auto-partitioning could not split)."""
    spec = P(axis_name)

    @jax.jit
    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec, spec),
        out_specs=RayHits(spec, spec, spec),
        check_vma=False,  # caster state is closed-over, replicated
    )
    def cast(origins, dirs):
        return caster.cast(origins, dirs)

    return cast

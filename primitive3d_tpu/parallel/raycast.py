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

from ..raycast import RayCaster, RayHits


def make_sharded_cast(
    caster: RayCaster, mesh: Mesh, axis_name: str = "data"
) -> Callable:
    """Returns jitted ``cast(origins, dirs) -> RayHits`` with rays sharded
    over ``axis_name`` and geometry replicated. Ray count must divide evenly
    by the axis size (pad externally otherwise)."""
    ray_sharding = NamedSharding(mesh, P(axis_name))
    rep = NamedSharding(mesh, P())

    @functools.partial(
        jax.jit,
        in_shardings=(ray_sharding, ray_sharding),
        out_shardings=RayHits(ray_sharding, ray_sharding, ray_sharding),
    )
    def cast(origins, dirs):
        return caster.cast(origins, dirs)

    return cast

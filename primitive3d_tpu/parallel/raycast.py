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
    over ``axis_name`` and geometry replicated. Ray counts that do not
    divide the axis size are padded internally (dummy rays, results sliced
    off).

    Built on ``shard_map`` — each chip runs the caster on its local ray
    slice, so every backend works unchanged, including the Pallas kernels
    (which pjit auto-partitioning could not split)."""
    spec = P(axis_name)
    S = mesh.shape[axis_name]

    @jax.jit
    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec, spec),
        out_specs=RayHits(spec, spec, spec),
        check_vma=False,  # caster state is closed-over, replicated
    )
    def cast_impl(origins, dirs):
        return caster.cast(origins, dirs)

    def cast(origins, dirs):
        origins = jnp.asarray(origins, jnp.float32).reshape(-1, 3)
        dirs = jnp.asarray(dirs, jnp.float32).reshape(-1, 3)
        R = origins.shape[0]
        pad = (-R) % S
        if pad:
            origins = jnp.concatenate(
                [origins, jnp.zeros((pad, 3), jnp.float32)]
            )
            dirs = jnp.concatenate([dirs, jnp.ones((pad, 3), jnp.float32)])
        out = cast_impl(origins, dirs)
        if pad:
            out = RayHits(*(a[:R] for a in out))
        return out

    return cast

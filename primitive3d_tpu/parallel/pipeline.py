"""Sharded flagship pipeline: data-parallel rays, replicated density grid.

Scales the differentiable SDF -> mesh -> depth-render step (pipeline.py) over
a device mesh (BASELINE.md config 5: 1080p rays + 256^3 grid + grad, sharded).
Design per SURVEY.md §2.3: rays are embarrassingly parallel, so each device
extracts the (replicated) mesh from the (replicated) grid and casts only its
ray slice with the fast Pallas cluster kernel; the scalar loss is a ``psum``
and the density gradient comes out replicated (XLA inserts the all-reduce of
the per-shard grid contributions in the backward pass automatically).

``shard_map`` rather than pjit auto-partitioning because the inner cast is a
Pallas kernel — an opaque custom call XLA cannot split; under shard_map every
device runs the single-device program on its slice unchanged.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..pipeline import render_depth


def sharded_sdf_fitting_loss(
    mesh: Mesh,
    density,
    origins,
    dirs,
    target_depth,
    axis_name: str = "data",
    **render_kw,
):
    """L2 depth-matching loss with rays sharded over ``axis_name``.

    Matches :func:`primitive3d_tpu.pipeline.sdf_fitting_loss` exactly (same
    mean over the full ray batch); differentiable wrt ``density``. The ray
    count must divide the axis size. ``render_kw`` is forwarded to
    :func:`render_depth` — use ``backend="pallas"`` for the fast path.
    """
    R = origins.shape[0]

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name), P(axis_name)),
        out_specs=P(),
        check_vma=False,  # scan carries mix device-invariant init + varying
    )
    def local(density, o, d, t):
        out = render_depth(density, o, d, **render_kw)
        return jax.lax.psum(jnp.sum((out.depth - t) ** 2), axis_name) / R

    # jit so arbitrarily-placed inputs are resharded to the in_specs layout
    return jax.jit(local)(density, origins, dirs, target_depth)

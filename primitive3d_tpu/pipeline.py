"""Flagship end-to-end pipeline: differentiable SDF -> mesh -> depth render.

Fuses the framework's pieces into one static-shape, jit-compatible program —
the capability the reference can only do in disconnected non-differentiable
steps (CUDA marching cubes, then a separately-built OptiX/BVH ray caster):

    density grid --(marching_cubes_padded)--> padded mesh
                 --(de-index)--> padded triangle soup (zero padding = misses)
                 --(MXU Plücker cast)--> depth / hit buffers

Everything is differentiable wrt the density grid: vertex positions through
the edge-interpolation weights, and depth through the hit triangle's plane
equation. This is the training-step core for SDF-fitting-from-renders, and
the program the multi-chip sharding layer scales out (rays are data-parallel;
the grid is replicated or tile-sharded).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .mxu_cast import cast_mxu, triangle_matrix
from .ops.marching_cubes import (MCResult, marching_cubes_padded,
                                 marching_cubes_soup)

Array = jax.Array


class RenderOut(NamedTuple):
    depth: Array  # (R,) float32; max_dist where no surface hit
    hit: Array  # (R,) bool
    # indexed-mesh extraction result; None on the pallas fast path, which
    # extracts a triangle soup directly (marching_cubes_soup) and never
    # builds the indexed mesh
    mc: Optional[MCResult] = None


def render_depth(
    density: Array,
    origins: Array,
    dirs: Array,
    *,
    thresh: float = 0.0,
    vert_capacity: int,
    face_capacity: int,
    lower=None,
    upper=None,
    vert_units: int = 0,
    cube_units: int = 0,
    active_capacity: int = 0,
    max_dist: float = 10.0,
    chunk: int = 512,
    backend: str = "auto",
) -> RenderOut:
    """Differentiable depth render of the thresh-isosurface of ``density``.

    Jittable (static capacities); gradients flow to ``density`` through both
    the extracted vertex positions and the ray-plane intersection.

    ``backend``: "pallas" uses the cluster kernel for hit finding (depth
    recomputed differentiably at the hit triangle — far faster than the
    O(R*T) all-pairs cast for large meshes; streams the Plücker tensor from
    HBM beyond its ~32k-triangle VMEM budget); "mxu" is the all-pairs cast.
    "auto" (default) picks "pallas" once ``face_capacity`` is past the
    all-pairs sweet spot. Both backends compose with shard_map ray
    data-parallelism (see parallel/pipeline.py) — each device runs the
    single-device program on its ray slice.
    """
    if backend == "auto":
        backend = "pallas" if face_capacity > 8192 else "mxu"
    o = jnp.asarray(origins, jnp.float32).reshape(-1, 3)
    d = jnp.asarray(dirs, jnp.float32).reshape(-1, 3)
    if backend == "pallas":
        # fast path: soup-direct extraction — no indexed mesh, no
        # vertices[faces] de-index gather (and no 19 + 20 ms fwd/bwd
        # round-trip through it at 256^3; round-5 flagship fix). Padded
        # soup rows are degenerate point triangles -> guaranteed misses.
        from .kernels.raycast_kernel import cast_clusters_diff

        sres = marching_cubes_soup(
            density,
            thresh,
            face_capacity=face_capacity,
            lower=lower,
            upper=upper,
            active_capacity=active_capacity,
        )
        interpret = jax.default_backend() not in ("tpu", "axon")
        depth, idx = cast_clusters_diff(
            sres.soup, o, d, max_dist=max_dist, interpret=interpret
        )
        return RenderOut(depth, idx >= 0, None)
    res = marching_cubes_padded(
        density,
        thresh,
        vert_capacity=vert_capacity,
        face_capacity=face_capacity,
        lower=lower,
        upper=upper,
        vert_units=vert_units,
        cube_units=cube_units,
        active_capacity=active_capacity,
    )
    # Padded face rows are [0,0,0] -> degenerate (v0,v0,v0) triangles -> den=0
    # -> guaranteed miss in the caster; no masking needed.
    tris = res.vertices[res.faces]  # (face_capacity, 3, 3)
    w = triangle_matrix(tris)
    depth, idx = cast_mxu(w, o, d, jnp.float32(max_dist), chunk)
    return RenderOut(depth, idx >= 0, res)


def sdf_fitting_loss(
    density: Array,
    origins: Array,
    dirs: Array,
    target_depth: Array,
    **kwargs,
) -> Array:
    """L2 depth-matching loss — the flagship training objective."""
    out = render_depth(density, origins, dirs, **kwargs)
    return jnp.mean((out.depth - target_depth) ** 2)

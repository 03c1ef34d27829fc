"""Sharded flagship pipeline: sharded extraction AND data-parallel rays.

Scales the differentiable SDF -> mesh -> depth-render step (pipeline.py)
over a device mesh (BASELINE.md config 5: 1080p rays + 256^3 grid + grad,
sharded over hosts). One mesh axis carries BOTH decompositions:

  * the density grid is x-slab sharded — each device runs SOUP-direct
    marching cubes (ops/marching_cubes._mc_soup_impl in shard-window mode)
    on its slab + a 1-row +x halo. A triangle soup has no vertex ids, so
    the sharded extraction needs NO distributed prefix scans, no global-id
    remap, and no vertex all-gather (round 4 composed mc_shard_body +
    remap + de-index here; the soup path deleted all three stages) —
    extraction and its backward scale with devices;
  * the per-shard soups are all-gathered (a few MB per step — the gather
    is differentiable, so XLA inserts the matching reduce-scatter in the
    backward) and every device builds the identity-order cluster set from
    the gathered soup. The build is a few ms of elementwise/reshape work —
    cheaper than all-gathering the 100+ MB Plücker tensor it produces;
  * rays are data-parallel: each device runs the streaming MXU cast with
    in-kernel finish selection on its ray slice (cast_clusters_diff), and
    the plane-cotangent scatter runs the work-list backward kernel per
    device on its own rays.

Replicated (serial) work per step is only the soup -> cluster-matrix build
and the per-face plane rows — the profiled stages (MC extract ~90 ms, cast
~17 ms, plane backward, soup/vertex scatters, MC backward) all shard.

``shard_map`` rather than pjit auto-partitioning because the inner cast is
a Pallas kernel — an opaque custom call XLA cannot split; under shard_map
every device runs the single-device program on its slice unchanged.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..core import debug
from ..kernels.raycast_kernel import cast_clusters_diff
from ..ops.marching_cubes import _mc_soup_impl


def sharded_sdf_fitting_loss(
    mesh: Mesh,
    density,
    origins,
    dirs,
    target_depth,
    axis_name: str = "data",
    *,
    thresh: float = 0.0,
    vert_capacity: int = 0,  # unused since round 5 (soup path, no verts)
    face_capacity: int,
    lower=None,
    upper=None,
    max_dist: float = 10.0,
    vert_units: int = 0,
    cube_units: int = 0,
    mxu_max_tris=None,
    mxu_stream_max_tris=None,
    backend: str = "pallas",  # the only sharded cast path (validated below)
    active_capacity: int = 0,  # GLOBAL active-cube bound (safe per shard)
    chunk: int = 512,  # unused in the sharded composition
):
    """L2 depth-matching loss, extraction-sharded AND ray-sharded.

    Matches :func:`primitive3d_tpu.pipeline.sdf_fitting_loss` semantics
    (same mean over the full ray batch; same plane-hold-fixed gradients),
    with ``face_capacity`` interpreted GLOBALLY: each shard gets a
    ``face_capacity / S`` slice (callers should keep it divisible by
    ``S * 128``). NOTE the sharding caveat: the capacity must bound the
    WORST shard's load times S, not just the global total — a surface
    concentrated in a few x-slabs can overflow those shards' slices while
    the global count fits. Per-shard counts are asserted against the
    per-shard cap device-side when traced under :func:`core.debug.checks`
    (``debug.checked``); outside a debug scope an overflowing shard
    truncates silently (same contract as ``MCSoupResult.overflowed``, which
    the scalar-loss API here cannot additionally return). The ray count
    must divide the axis size.

    Differentiable wrt ``density``; the gradient comes back replicated
    (XLA all-reduces the per-shard contributions of the replicated
    cluster-build stage and reduce-scatters the gathered-mesh stages).
    """
    if backend != "pallas":
        raise ValueError(
            "sharded_sdf_fitting_loss only implements the pallas cast path; "
            f"got backend={backend!r} (use pipeline.sdf_fitting_loss for "
            "other backends)")
    S = mesh.shape[axis_name]
    R = origins.shape[0]
    X = density.shape[0]
    del vert_capacity, vert_units, cube_units  # soup path: no vertex stage
    fcap = -(-face_capacity // (S * 128)) * 128  # identity clusters pad 128
    # per-shard active-cube budget: a shard's active count is bounded by
    # the GLOBAL active count, so the caller's global bound is safe on
    # every shard (no /S division — concentration cannot break it) and is
    # typically ~4x tighter than fcap, which the selection/expansion and
    # the corner-scatter backward all scale with
    acap = min(fcap, -(-active_capacity // 128) * 128) if active_capacity \
        else fcap
    thr = jnp.float32(thresh)

    # x-slab sharding needs X divisible by S: pad with edge-row replicas
    # (row_limit masks the padded cube rows, so padding emits nothing)
    Xp = -(-X // S) * S
    if Xp != X:
        density = jnp.concatenate(
            [density, jnp.broadcast_to(density[-1:], (Xp - X,) + density.shape[1:])],
            axis=0,
        )

    # world-coordinate bounds — same bbox convention as the single-chip op
    # (ops/marching_cubes.py: world = index * (upper-lower)/res + lower);
    # the soup impl derives the scale from these with x_total = unpadded X
    if lower is not None:
        lo_w = jnp.asarray(lower, jnp.float32)
        up_w = jnp.asarray(upper, jnp.float32)
    else:
        lo_w = jnp.zeros((3,), jnp.float32)
        up_w = jnp.asarray(
            [X, density.shape[1], density.shape[2]], jnp.float32)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(axis_name), P(axis_name)),
        out_specs=P(),
        check_vma=False,  # mixed invariant/varying carries in the MC scans
    )
    def local(slab, o, d, t):
        # Per-shard SOUP extraction (round 5): a triangle soup needs no
        # vertex numbering, so the x-slab sharding needs no distributed
        # prefix scans, no global-id remap, and no vertex all-gather —
        # only a 1-row +x halo (each owned cube row x needs density row
        # x+1). Invalid face slots emit point triangles -> guaranteed
        # misses, exactly like the single-chip soup path.
        s = jax.lax.axis_index(axis_name)
        Xs = slab.shape[0]
        perm = [(i, (i - 1) % S) for i in range(S)]
        halo = jax.lax.ppermute(slab[0:1], axis_name, perm)
        halo = jnp.where(s == S - 1, slab[-1:], halo)
        g = jnp.concatenate([slab, halo], axis=0)  # (Xs + 1, Y, Z)
        # owned cube rows: global [s*Xs, min((s+1)*Xs, X-1))
        row_limit = jnp.clip(X - 1 - s * Xs, 0, Xs)
        fused = 1 if jax.default_backend() in ("tpu", "axon") else 0
        sres = _mc_soup_impl(
            g, thr, lo_w, up_w, fcap, fused, acap,
            row_limit=row_limit, x_offset=s * Xs, x_total=X,
        )
        debug.check(
            jnp.logical_not(jnp.asarray(sres.overflowed)),
            "sharded_sdf_fitting_loss: shard face count {f} exceeds the "
            "per-shard face/active capacity {c}",
            f=sres.num_faces, c=jnp.int32(fcap),
        )
        soup = jax.lax.all_gather(sres.soup, axis_name, tiled=True)
        depth, _ = cast_clusters_diff(
            soup, o, d, max_dist=max_dist,
            interpret=jax.default_backend() not in ("tpu", "axon"),
            mxu_max_tris=mxu_max_tris,
            mxu_stream_max_tris=mxu_stream_max_tris,
        )
        return jax.lax.psum(jnp.sum((depth - t) ** 2), axis_name) / R

    # jit so arbitrarily-placed inputs are resharded to the in_specs layout
    return jax.jit(local)(density, origins, dirs, target_depth)

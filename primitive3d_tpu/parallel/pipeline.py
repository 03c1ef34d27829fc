"""Sharded flagship pipeline: sharded extraction AND data-parallel rays.

Scales the differentiable SDF -> mesh -> depth-render step (pipeline.py)
over a device mesh (BASELINE.md config 5: 1080p rays + 256^3 grid + grad,
sharded over hosts). One mesh axis carries BOTH decompositions:

  * the density grid is x-slab sharded — each device runs the sharded
    marching-cubes body (parallel/marching_cubes.mc_shard_body: halo
    ppermute, distributed prefix scan, globally consistent vertex ids) on
    its slab, so extraction and its backward scale with devices;
  * the mesh shards are then all-gathered (a few MB of vertices/faces per
    step — the gathers are differentiable, so XLA inserts the matching
    reduce-scatters in the backward) and every device builds the identity-
    order cluster set from the gathered soup. The build is a few ms of
    elementwise/reshape work — cheaper than all-gathering the 100+ MB
    Plücker tensor it produces;
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

from ..kernels.raycast_kernel import cast_clusters_diff
from .marching_cubes import mc_shard_body


def _remap_to_slots(faces, vbase_all, vcap):
    """Map globally-numbered vertex ids to gathered-buffer slot positions.

    Shard j owns global ids [vbase_all[j], vbase_all[j] + vcount_j), stored
    at buffer slots [j * vcap, j * vcap + vcount_j). The owning shard of id
    g is the LAST j with vbase_all[j] <= g (ties = empty shards). S is tiny,
    so the search is a broadcast compare, not a gather."""
    S = vbase_all.shape[0]
    ge = faces[..., None] >= vbase_all  # (..., S)
    j = jnp.sum(ge.astype(jnp.int32), axis=-1) - 1  # (...,)
    j = jnp.clip(j, 0, S - 1)
    return faces - vbase_all[j] + j * vcap


def sharded_sdf_fitting_loss(
    mesh: Mesh,
    density,
    origins,
    dirs,
    target_depth,
    axis_name: str = "data",
    *,
    thresh: float = 0.0,
    vert_capacity: int,
    face_capacity: int,
    lower=None,
    upper=None,
    max_dist: float = 10.0,
    vert_units: int = 0,
    cube_units: int = 0,
    mxu_max_tris=None,
    mxu_stream_max_tris=None,
    backend: str = "pallas",  # the only sharded cast path (validated below)
    active_capacity: int = 0,  # unused (per-shard budgets are derived)
    chunk: int = 512,  # unused in the sharded composition
):
    """L2 depth-matching loss, extraction-sharded AND ray-sharded.

    Matches :func:`primitive3d_tpu.pipeline.sdf_fitting_loss` semantics
    (same mean over the full ray batch; same plane-hold-fixed gradients),
    with the capacities interpreted GLOBALLY: each shard gets a
    ``capacity / S`` slice (callers should keep capacities divisible by
    ``S * 128``). NOTE the sharding caveat: capacities must bound the WORST
    shard's load times S, not just the global total — a surface concentrated
    in a few x-slabs can overflow those shards' slices while the global
    counts fit. Per-shard counts are asserted against the per-shard caps
    device-side when traced under :func:`core.debug.checks`
    (``debug.checked``); outside a debug scope an overflowing shard
    truncates silently (same contract as ``MCResult.overflowed``, which the
    scalar-loss API here cannot additionally return). The ray count must
    divide the axis size.

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
    vcap = -(-vert_capacity // S)
    fcap = -(-face_capacity // (S * 128)) * 128  # identity clusters pad 128
    thr = jnp.float32(thresh)

    # x-slab sharding needs X divisible by S: pad with edge-row replicas
    # (mc_shard_body masks rows >= Xv, so padding emits nothing)
    Xp = -(-X // S) * S
    if Xp != X:
        density = jnp.concatenate(
            [density, jnp.broadcast_to(density[-1:], (Xp - X,) + density.shape[1:])],
            axis=0,
        )

    # world-coordinate mapping — same bbox convention as the single-chip op
    # (ops/marching_cubes.py: world = index * (upper-lower)/res + lower)
    if lower is not None:
        lo = jnp.asarray(lower, jnp.float32)
        hi = jnp.asarray(upper, jnp.float32)
        # original (unpadded) resolution, matching marching_cubes_padded
        scale = (hi - lo) / jnp.asarray(
            [X, density.shape[1], density.shape[2]], jnp.float32)
    else:
        lo = jnp.zeros((3,), jnp.float32)
        scale = jnp.ones((3,), jnp.float32)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(axis_name), P(axis_name)),
        out_specs=P(),
        check_vma=False,  # mixed invariant/varying carries in the MC scans
    )
    def local(slab, o, d, t):
        v_k, f_k, vb, fb, vc, fc = mc_shard_body(
            slab, thresh=thr, axis_name=axis_name, S=S, Xv=X,
            vert_cap_per_shard=vcap, face_cap_per_shard=fcap,
            vert_units=vert_units, cube_units=cube_units,
        )
        # index space -> world space (differentiable through v_k)
        v_k = v_k * scale[None, :] + lo[None, :]
        # face slots beyond this shard's count reference vertex id 0 ->
        # they de-index to point triangles (never hit) after the remap
        v_all = jax.lax.all_gather(v_k, axis_name, tiled=True)  # (S*vcap,3)
        vb_all = jax.lax.all_gather(vb, axis_name, tiled=True)  # (S,)
        slots = _remap_to_slots(f_k, vb_all, vcap)  # (fcap, 3)
        soup_k = v_all[slots]  # (fcap, 3, 3) — sharded de-index
        soup = jax.lax.all_gather(soup_k, axis_name, tiled=True)
        depth, _ = cast_clusters_diff(
            soup, o, d, max_dist=max_dist,
            interpret=jax.default_backend() not in ("tpu", "axon"),
            mxu_max_tris=mxu_max_tris,
            mxu_stream_max_tris=mxu_stream_max_tris,
        )
        return jax.lax.psum(jnp.sum((depth - t) ** 2), axis_name) / R

    # jit so arbitrarily-placed inputs are resharded to the in_specs layout
    return jax.jit(local)(density, origins, dirs, target_depth)

"""Ray casting against triangle meshes: depth / normal / primitive-id buffers.

Covers the reference's ``RayCaster`` (reference:
src/prim3d/Utility/ray_cast.h:55-74 — abstract interface + factory
``create_raycaster(vertices, faces)``, with an OptiX hardware-RT backend and a
custom CUDA BVH backend) with TPU-native backends:

  * ``bruteforce`` — scan over triangle chunks, fully vectorised
    Möller-Trumbore across (ray x chunk) tiles. Exact; the correctness oracle
    and a strong baseline for small meshes.
  * ``bvh`` — LBVH (Morton + Karras radix tree) built on device, traversed
    with a fixed-depth stack inside a vmapped while_loop (see bvh/).

API differences from the reference, by design:
  * Functional: ``cast`` returns (depth, normals, face_id) instead of mutating
    caller-allocated output tensors (reference: ray_cast.cu:387-423).
  * Miss semantics unified with the reference's BVH backend: depth = max_dist
    (default 10.0 = the reference's MAX_DIST, bvh.cu:13), normal = 0,
    face_id = -1 — including the OptiX variant's quirk of leaving ids
    unwritten on miss (device_programs.cu:43-45), which we fix.
  * Hits at t >= max_dist are misses (parity with mint init, bvh.cu:155).

Watertightness caveat (pallas backend): by default the cluster kernel's
sign-bit agreement test treats an exactly-zero Plücker side product (a ray
passing exactly through a shared triangle edge, measure-zero in f32) as
sign(+0) = positive / sign(-0) = negative rather than as a wildcard, so
such a ray can miss both adjacent triangles. Grid-aligned rays against
marching-cubes meshes are the one realistic way to produce exact zeros;
opt in to ``edge_wildcard=True`` (constructor or RayCastConfig) to treat
exact zeros as agreeing with any sign — watertight through shared edges
for a few extra vector ops per cluster visit — or use the
"mxu"/"bruteforce" backends.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from .core import debug
from .geometry import triangle as tri_ops

Array = jax.Array

DEFAULT_MAX_DIST = 10.0  # reference: bvh.cu:13


class RayHits(NamedTuple):
    depth: Array  # (R,) float32; max_dist on miss
    normals: Array  # (R, 3) float32; zeros on miss
    face_id: Array  # (R,) int32; -1 on miss


def _deindex(vertices, faces) -> Array:
    """Gather faces into a flat (T, 3, 3) triangle array.

    The analog of the reference's de-indexing pass (ray_cast.cu:340-370 CPU
    loop / ray_cast.cu:14-35 CUDA kernel).
    """
    v = jnp.asarray(vertices, jnp.float32)
    f = jnp.asarray(faces, jnp.int32)
    if v.ndim != 2 or v.shape[-1] != 3:
        raise ValueError(f"vertices must be (N, 3), got {v.shape}")
    if f.ndim != 2 or f.shape[-1] != 3:
        raise ValueError(f"faces must be (F, 3), got {f.shape}")
    return v[f]  # (T, 3, 3)


@functools.partial(jax.jit, static_argnames=("chunk",))
def _cast_bruteforce(
    tris: Array, origins: Array, dirs: Array, max_dist: Array, chunk: int = 512
) -> RayHits:
    T = tris.shape[0]
    R = origins.shape[0]
    pad = (-T) % chunk
    # padded triangles are degenerate (all-zero) -> never hit
    tris_p = jnp.concatenate(
        [tris, jnp.zeros((pad, 3, 3), tris.dtype)], axis=0
    ).reshape(-1, chunk, 3, 3)

    def body(carry, xs):
        best_t, best_i = carry
        tri_chunk, base = xs
        t = tri_ops.ray_intersect(
            origins[:, None, :], dirs[:, None, :], tri_chunk[None, :, :, :]
        )  # (R, chunk)
        i = jnp.argmin(t, axis=-1)  # first min wins ties within chunk
        tmin = jnp.take_along_axis(t, i[:, None], axis=-1)[:, 0]
        upd = tmin < best_t  # strict: earlier chunks win ties
        best_t = jnp.where(upd, tmin, best_t)
        best_i = jnp.where(upd, base + i.astype(jnp.int32), best_i)
        return (best_t, best_i), None

    init = (
        jnp.full((R,), max_dist, jnp.float32),
        jnp.full((R,), -1, jnp.int32),
    )
    bases = jnp.arange(tris_p.shape[0], dtype=jnp.int32) * chunk
    (best_t, best_i), _ = jax.lax.scan(body, init, (tris_p, bases))

    hit = best_i >= 0
    n = tri_ops.normals(tris[jnp.maximum(best_i, 0)])
    normals = jnp.where(hit[:, None], n, 0.0)
    return RayHits(best_t, normals, best_i)


def _finish_data(triangles) -> Array:
    """Per-face finish data (T, 5): [n, a.n, 1/|n|] — precomputed once per
    caster build so the per-ray epilogue gathers 5 floats instead of the
    9-float triangle (per-ray gathers at ~9 ns/element dominate the
    post-kernel cost at image scale) and does no per-ray cross products."""
    a = triangles[:, 0]
    n = jnp.cross(triangles[:, 1] - a, triangles[:, 2] - a)
    inv = 1.0 / jnp.maximum(
        jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-30
    )
    return jnp.concatenate(
        [n, jnp.sum(a * n, axis=-1, keepdims=True), inv], axis=-1
    )


@functools.partial(jax.jit, static_argnames=("max_dist",))
def _finish_hits_fin(finr, depth_k, sidx, o, d, max_dist: float) -> RayHits:
    """Elementwise finish from the kernel-selected fin rows (R, 8).

    ``finr`` rows are [n, a.n, 1/|n|, fid, 0, 0] for each ray's winning
    triangle (see MxuClusterBVH.fin) — no per-ray gathers at all: the
    kernel already selected them on the MXU. The refine recomputes the
    winner's depth from its plane (t = (a.n - o.n) / d.n, algebraically
    the Möller-Trumbore t) to shed the kernel's 2^-17 packed-index
    quantisation; everything here is pure VPU math over dense buffers.
    """
    fid_f = finr[:, 5]
    hit = (sidx >= 0) & (fid_f >= 0.0)
    face_id = jnp.where(hit, fid_f.astype(jnp.int32), -1)
    nvec = finr[:, :3]
    den = jnp.sum(d * nvec, axis=-1)
    t_exact = (finr[:, 3] - jnp.sum(o * nvec, axis=-1)) / jnp.where(
        den == 0, 1e-30, den
    )
    ok = hit & (den != 0) & (t_exact >= 0.0) & (t_exact < max_dist)
    depth = jnp.where(ok, t_exact, depth_k)
    depth = jnp.where(hit, depth, jnp.float32(max_dist))
    normals = jnp.where(hit[:, None], nvec * finr[:, 4:5], 0.0)
    return RayHits(depth, normals, face_id)


@functools.partial(jax.jit, static_argnames=("max_dist",))
def _finish_hits(fin, prim_order, depth_k, sidx, o, d,
                 max_dist: float) -> RayHits:
    """Map kernel output (depth, sorted-index) to final RayHits buffers.

    Includes the exact-f32 refine of each winning triangle: the cluster
    kernel's depth carries a 2^-17 packed-index quantisation and double-bf16
    product noise; recomputing the winner's t from its plane equation
    ``t = (a.n - o.n) / d.n`` (algebraically the Möller-Trumbore t) restores
    f32 accuracy (BASELINE.md: depth buffers allclose vs goldens). ``fin``
    is the per-face :func:`_finish_data`.
    """
    safe = jnp.maximum(sidx, 0)
    fid = prim_order[safe]
    # gate on a real face id too: a padding slot (prim_order == -1) should
    # never win the packed min, but the refine/normals must not depend on
    # that kernel invariant
    hit = (sidx >= 0) & (fid >= 0)
    face_id = jnp.where(hit, fid, -1)
    fr = fin[jnp.maximum(face_id, 0)]  # (R, 5)
    nvec = fr[:, :3]
    den = jnp.sum(d * nvec, axis=-1)
    t_exact = (fr[:, 3] - jnp.sum(o * nvec, axis=-1)) / jnp.where(
        den == 0, 1e-30, den
    )
    # if the plane recompute disagrees on a grazing winner, keep kernel depth
    ok = hit & (den != 0) & (t_exact >= 0.0) & (t_exact < max_dist)
    depth = jnp.where(ok, t_exact, depth_k)
    depth = jnp.where(hit, depth, jnp.float32(max_dist))
    normals = jnp.where(hit[:, None], nvec * fr[:, 4:5], 0.0)
    return RayHits(depth, normals, jnp.where(hit, face_id, -1))


class RayCaster:
    """Ray caster over a fixed triangle mesh (build once, cast many)."""

    def __init__(self, vertices, faces, max_dist: float = DEFAULT_MAX_DIST):
        self.triangles = _deindex(vertices, faces)
        self.max_dist = float(max_dist)

    @property
    def num_triangles(self) -> int:
        return self.triangles.shape[0]

    def cast(self, origins, directions) -> RayHits:
        """Cast rays; returns (depth, normals, face_id), all shape (R, ...).

        Functional equivalent of the reference's ``RayCaster.invoke``
        (ray_cast.cu:387-423) with BVH-backend miss semantics.
        """
        raise NotImplementedError

    # Reference-compatible spelling.
    def invoke(self, origins, directions) -> RayHits:
        return self.cast(origins, directions)

    @staticmethod
    def _debug_check_rays(o, d) -> None:
        """Device-side ray sanity (no-op unless core.debug checks are on)."""
        debug.check_finite(o, "ray origins")
        debug.check_finite(d, "ray directions")
        debug.check(
            jnp.all(jnp.sum(d * d, axis=-1) > 0.0),
            "ray directions contain zero-length vectors",
        )


class MxuRayCaster(RayCaster):
    """Exact all-pairs caster on the MXU (see mxu_cast.py). Default backend."""

    def __init__(self, vertices, faces, max_dist=DEFAULT_MAX_DIST, chunk=512):
        super().__init__(vertices, faces, max_dist)
        from .mxu_cast import triangle_matrix

        self.chunk = int(chunk)
        self.w = triangle_matrix(self.triangles)

    def cast(self, origins, directions) -> RayHits:
        from .mxu_cast import cast_mxu

        o = jnp.asarray(origins, jnp.float32).reshape(-1, 3)
        d = jnp.asarray(directions, jnp.float32).reshape(-1, 3)
        self._debug_check_rays(o, d)
        depth, idx = cast_mxu(
            self.w, o, d, jnp.float32(self.max_dist), self.chunk
        )
        hit = idx >= 0
        n = tri_ops.normals(self.triangles[jnp.maximum(idx, 0)])
        normals = jnp.where(hit[:, None], n, 0.0)
        return RayHits(depth, normals, idx)


class PallasRayCaster(RayCaster):
    """Two-level cluster caster as a Pallas TPU kernel (the fast path).

    Meshes whose Plücker tensor fits VMEM (~32k triangles at 384 B/triangle)
    use the MXU cluster kernel (one matmul per cluster/ray-chunk pair);
    larger meshes stream the tensor from HBM; beyond the stream cap the
    scalar-broadcast cluster kernel takes over. Falls back to interpreter
    mode off-TPU (tests); see kernels/raycast_kernel.py.
    """

    MXU_MAX_TRIS = 32_000  # VMEM-resident w2 tensor (384 B/triangle)
    # HBM-streamed w2: the stream work word carries a 15-bit cluster id, so
    # the tier reaches 32767 * cluster_size triangles (384 B/triangle of
    # HBM — 3.2 GB at the S=256 maximum); past that the scalar-broadcast
    # kernel takes over. Kept as a class attr for back-compat: None in the
    # constructor now means "derive from the cluster size".
    MXU_STREAM_MAX_TRIS = 2_000_000
    AUTO_FAT_CLUSTER_TRIS = 500_000  # auto cluster_size boundary

    def __init__(self, vertices, faces, max_dist=DEFAULT_MAX_DIST,
                 mxu_max_tris=None, mxu_stream_max_tris=None,
                 cluster_size=None, edge_wildcard=False):
        super().__init__(vertices, faces, max_dist)
        from .bvh.clusters import CLUSTER_SIZE, build_clusters, build_mxu_clusters

        self.edge_wildcard = bool(edge_wildcard)
        cap = self.MXU_MAX_TRIS if mxu_max_tris is None else mxu_max_tris
        if cluster_size is None:
            # fatter clusters amortize the stream tier's per-entry fixed
            # costs on large meshes: measured 17.6 -> 22.6 Mrays/s at 1.7M
            # tris (tools/stream_sweep.py, r4); 128 stays best below ~500k
            cs = (CLUSTER_SIZE if self.num_triangles
                  <= self.AUTO_FAT_CLUSTER_TRIS else 2 * CLUSTER_SIZE)
        else:
            cs = cluster_size
        scap = (32767 * cs if mxu_stream_max_tris is None
                else mxu_stream_max_tris)
        self.use_mxu = self.num_triangles <= scap
        self.mxu_stream = self.num_triangles > cap
        build = build_mxu_clusters if self.use_mxu else build_clusters
        self.cbvh = jax.block_until_ready(
            build(self.triangles, cluster_size=cs))
        if not self.use_mxu:
            # only the scalar-broadcast fallback still finishes host-side
            self._fin = _finish_data(self.triangles)  # build-once (T, 5)

    def cast(self, origins, directions) -> RayHits:
        from .kernels.raycast_kernel import cast_clusters, cast_clusters_mxu

        o = jnp.asarray(origins, jnp.float32).reshape(-1, 3)
        d = jnp.asarray(directions, jnp.float32).reshape(-1, 3)
        self._debug_check_rays(o, d)
        interpret = jax.default_backend() not in ("tpu", "axon")
        if self.use_mxu:
            depth, sidx, finr = cast_clusters_mxu(
                self.cbvh, o, d, max_dist=self.max_dist,
                interpret=interpret, stream=self.mxu_stream, with_fin=True,
                edge_wildcard=self.edge_wildcard,
            )
            return _finish_hits_fin(
                finr, depth, sidx, o, d, max_dist=self.max_dist
            )
        depth, sidx = cast_clusters(
            self.cbvh, o, d, max_dist=self.max_dist, interpret=interpret
        )
        return _finish_hits(
            self._fin, self.cbvh.prim_order, depth, sidx, o, d,
            max_dist=self.max_dist,
        )


class BruteForceRayCaster(RayCaster):
    """Exact all-pairs caster; oracle + small-mesh fast path."""

    def __init__(self, vertices, faces, max_dist=DEFAULT_MAX_DIST, chunk=512):
        super().__init__(vertices, faces, max_dist)
        self.chunk = int(chunk)

    def cast(self, origins, directions) -> RayHits:
        o = jnp.asarray(origins, jnp.float32).reshape(-1, 3)
        d = jnp.asarray(directions, jnp.float32).reshape(-1, 3)
        self._debug_check_rays(o, d)
        return _cast_bruteforce(
            self.triangles, o, d, jnp.float32(self.max_dist), self.chunk
        )


def available_backends() -> tuple:
    """Runtime-selectable backends (the analog of the reference's
    compile-time ``prim3d.ENABLE_OPTIX`` flag, prim3d/__init__.py:9)."""
    return ("pallas", "mxu", "bvh", "bruteforce")


def create_raycaster(
    vertices,
    faces,
    backend: Optional[str] = None,
    max_dist: Optional[float] = None,
    config=None,
) -> RayCaster:
    """Build a ray caster (factory, reference: ray_cast.cu:437-450).

    backend: "pallas" (the MXU cluster kernel, the TPU fast path), "mxu"
    (exact all-pairs on the systolic array), "bvh" (LBVH traversal),
    "bruteforce" (VPU all-pairs oracle), or "auto" (pallas on TPU, mxu
    elsewhere). ``config`` is a :class:`core.config.RayCastConfig` supplying
    defaults; explicit arguments override it.
    """
    from .core.config import RayCastConfig

    cfg = config or RayCastConfig()
    backend = backend or cfg.backend
    max_dist = cfg.max_dist if max_dist is None else max_dist
    if backend == "auto":
        on_tpu = jax.default_backend() in ("tpu", "axon")
        backend = "pallas" if on_tpu else "mxu"
    if backend == "mxu":
        return MxuRayCaster(vertices, faces, max_dist, chunk=cfg.mxu_chunk)
    if backend == "pallas":
        return PallasRayCaster(
            vertices, faces, max_dist,
            mxu_max_tris=cfg.mxu_max_tris,
            mxu_stream_max_tris=cfg.mxu_stream_max_tris,
            cluster_size=cfg.cluster_size,
            edge_wildcard=cfg.edge_wildcard,
        )
    if backend == "bruteforce":
        return BruteForceRayCaster(vertices, faces, max_dist)
    if backend == "bvh":
        from .bvh.caster import BvhRayCaster

        return BvhRayCaster(vertices, faces, max_dist)
    raise ValueError(f"unknown backend: {backend!r}")

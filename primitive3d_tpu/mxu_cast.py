"""MXU ray casting: Möller-Trumbore as a matrix multiply.

TPU-native design with no reference-counterpart: the reference brute-forces
rays against leaf triangles one scalar at a time inside its CUDA traversal
(reference: src/prim3d/Geometry/triangle.h:18-38, bvh.cu:163-171). On TPU the
FLOPs live in the 128x128 systolic array, so we recast the intersection test
as a matmul:

  * A ray is a 10-vector  r = [rd, ro x rd, ro, 1]  (direction, Plücker
    moment, origin, homogeneous 1).
  * A triangle contributes 5 matrix columns:
      - 3 edge columns [m_e, d_e, 0, 0] giving the Plücker side products
        s_i = rd·m_e + (ro x rd)·d_e  (sign of the ray-edge crossing);
      - a denominator column [N, 0, 0, 0]       -> den = rd·N;
      - a numerator column  [0, 0, -N, a·N]     -> num = (a - ro)·N.
  * S = R @ W on the MXU; a ray hits iff its three side products share a
    sign (double-sided, same semantics as the reference's u/v/t guards) and
    t = num/den is in [0, best).

Complexity is O(R*T) — this is the *exact* fast path for small-to-medium
meshes and the per-leaf-cluster primitive for the two-level casters.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

MISS = jnp.float32(jnp.finfo(jnp.float32).max)


def ray_vectors(origins: Array, dirs: Array) -> Array:
    """Pack rays (R,3),(R,3) into Plücker 10-vectors (R, 10)."""
    m = jnp.cross(origins, dirs)
    ones = jnp.ones((*origins.shape[:-1], 1), origins.dtype)
    return jnp.concatenate([dirs, m, origins, ones], axis=-1)


def triangle_matrix(tris: Array) -> Array:
    """Pack triangles (T,3,3) into intersection matrices (T, 10, 5).

    Degenerate triangles (repeated vertex or zero normal — e.g. the
    ``(v0, v0, v0)`` point triangles produced by capacity-padded faces
    ``[0,0,0]``) get an exactly-zero matrix. This must be explicit: XLA
    contracts the cross-product mul-sub into FMAs, so ``cross(a, a)``
    evaluates to a tiny rounding residue rather than 0, which would turn
    the sign-agreement hit test into a spurious hit with garbage t.
    """
    a, b, c = tris[:, 0], tris[:, 1], tris[:, 2]
    n = jnp.cross(b - a, c - a)
    zeros3 = jnp.zeros_like(a)
    zeros1 = jnp.zeros((tris.shape[0], 1), tris.dtype)

    def edge_col(p, q):
        return jnp.concatenate(
            [jnp.cross(p, q), q - p, zeros3, zeros1], axis=-1
        )  # (T, 10)

    cols = [
        edge_col(a, b),
        edge_col(b, c),
        edge_col(c, a),
        jnp.concatenate([n, zeros3, zeros3, zeros1], axis=-1),
        jnp.concatenate(
            [zeros3, zeros3, -n, jnp.sum(a * n, axis=-1, keepdims=True)],
            axis=-1,
        ),
    ]
    w = jnp.stack(cols, axis=-1)  # (T, 10, 5)
    deg = (
        jnp.all(a == b, axis=-1)
        | jnp.all(b == c, axis=-1)
        | jnp.all(c == a, axis=-1)
        | jnp.all(n == 0.0, axis=-1)
    )
    return jnp.where(deg[:, None, None], 0.0, w)


def chunk_hits(
    rvec: Array, w_chunk: Array, precision=jax.lax.Precision.HIGHEST
) -> Array:
    """Intersection t (MISS on miss) for all rays x one triangle chunk.

    rvec: (R, 10); w_chunk: (Tc, 10, 5) -> t: (R, Tc).
    """
    Tc = w_chunk.shape[0]
    S = jax.lax.dot_general(
        rvec,
        w_chunk.transpose(1, 0, 2).reshape(10, Tc * 5),
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=precision,
        preferred_element_type=jnp.float32,
    ).reshape(rvec.shape[0], Tc, 5)
    s0, s1, s2, den, num = (S[..., i] for i in range(5))
    inside = ((s0 >= 0) & (s1 >= 0) & (s2 >= 0)) | (
        (s0 <= 0) & (s1 <= 0) & (s2 <= 0)
    )
    t = num / jnp.where(den == 0, 1e-30, den)
    ok = inside & (den != 0) & (t >= 0)
    return jnp.where(ok, t, MISS)


@functools.partial(jax.jit, static_argnames=("chunk",))
def cast_mxu(
    w: Array, origins: Array, dirs: Array, max_dist: Array, chunk: int = 512
) -> Tuple[Array, Array]:
    """Closest hit of every ray against every triangle, MXU-tiled.

    w: (T, 10, 5) from :func:`triangle_matrix` (zero rows = padding; zero
    normal => den == 0 => never hits). Returns (t, tri_index) with
    tri_index = -1 on miss.
    """
    T = w.shape[0]
    R = origins.shape[0]
    pad = (-T) % chunk
    w_p = jnp.concatenate([w, jnp.zeros((pad, 10, 5), w.dtype)]).reshape(
        -1, chunk, 10, 5
    )
    rvec = ray_vectors(origins, dirs)

    def body(carry, xs):
        best_t, best_i = carry
        w_chunk, base = xs
        t = chunk_hits(rvec, w_chunk)  # (R, chunk)
        i = jnp.argmin(t, axis=-1)
        tmin = jnp.take_along_axis(t, i[:, None], axis=-1)[:, 0]
        upd = tmin < best_t
        best_t = jnp.where(upd, tmin, best_t)
        best_i = jnp.where(upd, base + i.astype(jnp.int32), best_i)
        return (best_t, best_i), None

    init = (
        jnp.full((R,), max_dist, jnp.float32),
        jnp.full((R,), -1, jnp.int32),
    )
    bases = jnp.arange(w_p.shape[0], dtype=jnp.int32) * chunk
    (best_t, best_i), _ = jax.lax.scan(body, init, (w_p, bases))
    return best_t, best_i

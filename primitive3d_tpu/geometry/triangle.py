"""Vectorised triangle primitives (batched, jit/vmap-friendly).

Functional equivalents of the reference's ``Triangle`` struct (reference:
src/prim3d/Geometry/triangle.h:12-56). All functions broadcast over leading
batch dimensions; triangles are ``(..., 3, 3)`` arrays of [a, b, c] rows.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

MISS = jnp.float32(jnp.finfo(jnp.float32).max)


def normals(tris: Array, normalize: bool = True) -> Array:
    """Geometric normals (b-a) x (c-a) (reference: triangle.h:13-15)."""
    n = jnp.cross(tris[..., 1, :] - tris[..., 0, :], tris[..., 2, :] - tris[..., 0, :])
    if normalize:
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-30)
    return n


def centroids(tris: Array) -> Array:
    """(a + b + c) / 3 (reference: triangle.h:40-46)."""
    return jnp.mean(tris, axis=-2)


def ray_intersect(ro: Array, rd: Array, tris: Array) -> Array:
    """Ray-triangle intersection parameter t, or float32 max on miss.

    The Inigo Quilez formulation of Möller-Trumbore the reference uses
    (reference: triangle.h:18-33): double-sided, miss iff u<0, u>1, v<0,
    u+v>1 or t<0. Broadcasts ``ro``/``rd`` (..., 3) against ``tris``
    (..., 3, 3).
    """
    a = tris[..., 0, :]
    v1v0 = tris[..., 1, :] - a
    v2v0 = tris[..., 2, :] - a
    rov0 = ro - a
    n = jnp.cross(v1v0, v2v0)
    q = jnp.cross(rov0, rd)
    denom = jnp.sum(rd * n, axis=-1)
    d = 1.0 / jnp.where(denom == 0, 1e-30, denom)
    u = d * -jnp.sum(q * v2v0, axis=-1)
    v = d * jnp.sum(q * v1v0, axis=-1)
    t = d * -jnp.sum(n * rov0, axis=-1)
    # denom == 0 covers rays parallel to the plane AND degenerate (e.g.
    # zero-padded) triangles; the reference reaches the same outcome through
    # inf/NaN propagation in the u/v/t guards.
    miss = (
        (u < 0.0) | (u > 1.0) | (v < 0.0) | ((u + v) > 1.0) | (t < 0.0)
        | (denom == 0)
    )
    return jnp.where(miss, MISS, t)

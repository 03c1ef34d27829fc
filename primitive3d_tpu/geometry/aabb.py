"""Vectorised axis-aligned bounding boxes.

Functional equivalents of the reference's ``BoundingBox`` struct (reference:
src/prim3d/Geometry/bounding_box.h:35-243). Boxes are ``(..., 2, 3)`` arrays
stacking [min, max]; all ops broadcast over leading batch dims.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

MISS = jnp.float32(jnp.finfo(jnp.float32).max)


def empty_box(shape=()) -> Array:
    lo = jnp.full((*shape, 3), jnp.inf, jnp.float32)
    hi = jnp.full((*shape, 3), -jnp.inf, jnp.float32)
    return jnp.stack([lo, hi], axis=-2)


def from_points(points: Array) -> Array:
    """Tight box over points (..., N, 3) -> (..., 2, 3)."""
    return jnp.stack(
        [jnp.min(points, axis=-2), jnp.max(points, axis=-2)], axis=-2
    )


def union(a: Array, b: Array) -> Array:
    """Enlarge a to cover b (reference: bounding_box.h:55-58)."""
    return jnp.stack(
        [
            jnp.minimum(a[..., 0, :], b[..., 0, :]),
            jnp.maximum(a[..., 1, :], b[..., 1, :]),
        ],
        axis=-2,
    )


def diag(box: Array) -> Array:
    return box[..., 1, :] - box[..., 0, :]


def inflate(box: Array, amount) -> Array:
    """Grow the box by ``amount`` on every side (reference: bounding_box.h:71-74)."""
    return jnp.stack(
        [box[..., 0, :] - amount, box[..., 1, :] + amount], axis=-2
    )


def intersection(a: Array, b: Array) -> Array:
    """Box-box intersection; may be empty (reference: bounding_box.h:88-93)."""
    return jnp.stack(
        [
            jnp.maximum(a[..., 0, :], b[..., 0, :]),
            jnp.minimum(a[..., 1, :], b[..., 1, :]),
        ],
        axis=-2,
    )


def is_empty(box: Array) -> Array:
    return jnp.any(box[..., 1, :] < box[..., 0, :], axis=-1)


def intersects(a: Array, b: Array) -> Array:
    """Box-box overlap test (reference: bounding_box.h:95-97)."""
    return ~is_empty(intersection(a, b))


def relative_pos(box: Array, p: Array) -> Array:
    """(p - min) / diag (reference: bounding_box.h:80-82)."""
    return (p - box[..., 0, :]) / diag(box)


def center(box: Array) -> Array:
    return (box[..., 0, :] + box[..., 1, :]) * 0.5


def contains(box: Array, p: Array) -> Array:
    return jnp.all((p >= box[..., 0, :]) & (p <= box[..., 1, :]), axis=-1)


def distance_sq(box: Array, p: Array) -> Array:
    """Squared point-box distance (reference: bounding_box.h:221-223)."""
    d = jnp.maximum(
        jnp.maximum(box[..., 0, :] - p, p - box[..., 1, :]), 0.0
    )
    return jnp.sum(d * d, axis=-1)


def signed_distance(box: Array, p: Array) -> Array:
    """SDF-style signed distance (reference: bounding_box.h:225-228).

    Note: reproduces the reference formula, which measures from the box
    [min, min+diag] with |p-min| folding — exact parity, quirks included.
    """
    q = jnp.abs(p - box[..., 0, :]) - diag(box)
    outside = jnp.linalg.norm(jnp.maximum(q, 0.0), axis=-1)
    inside = jnp.minimum(jnp.max(q, axis=-1), 0.0)
    return outside + inside


def ray_intersect(box: Array, ro: Array, rd: Array) -> Array:
    """Slab-method ray-AABB test -> (tmin, tmax), (MISS, MISS) when disjoint.

    Matches the reference's semantics (reference: bounding_box.h:157-204),
    computed branch-free: per-axis entry/exit, intersect intervals, miss iff
    entry > exit (IEEE inf handling covers axis-parallel rays).
    """
    inv = 1.0 / rd  # +-inf for zero components, as in the reference's division
    t0 = (box[..., 0, :] - ro) * inv
    t1 = (box[..., 1, :] - ro) * inv
    per_axis_min = jnp.minimum(t0, t1)
    per_axis_max = jnp.maximum(t0, t1)
    tmin = jnp.max(per_axis_min, axis=-1)
    tmax = jnp.min(per_axis_max, axis=-1)
    miss = tmin > tmax
    return jnp.stack(
        [jnp.where(miss, MISS, tmin), jnp.where(miss, MISS, tmax)], axis=-1
    )


def _project_minmax(points: Array, axis_vec: Array):
    """Min/max of points (..., N, 3) projected on axis (..., 3)."""
    d = jnp.sum(points * axis_vec[..., None, :], axis=-1)
    return jnp.min(d, axis=-1), jnp.max(d, axis=-1)


def intersects_triangle(box: Array, tris: Array) -> Array:
    """SAT box-triangle overlap test (reference: bounding_box.h:99-155).

    13 separating-axis candidates: 3 box normals, the triangle normal, and the
    9 edge cross products. Broadcasts box (..., 2, 3) against tris (..., 3, 3).
    """
    lo, hi = box[..., 0, :], box[..., 1, :]

    # box corner points (..., 8, 3)
    signs = jnp.asarray(
        [[x, y, z] for x in (0, 1) for y in (0, 1) for z in (0, 1)],
        jnp.float32,
    )
    corners = lo[..., None, :] * (1 - signs) + hi[..., None, :] * signs

    # axis 1-3: box normals -> interval test on triangle extents
    tri_min = jnp.min(tris, axis=-2)
    tri_max = jnp.max(tris, axis=-2)
    sep_box_axes = jnp.any((tri_max < lo) | (tri_min > hi), axis=-1)

    # axis 4: triangle normal
    e0 = tris[..., 1, :] - tris[..., 0, :]
    e1 = tris[..., 2, :] - tris[..., 0, :]
    n = jnp.cross(e0, e1)
    tri_off = jnp.sum(n * tris[..., 0, :], axis=-1)
    bmin, bmax = _project_minmax(corners, n)
    sep_tri_normal = (bmax < tri_off) | (bmin > tri_off)

    # axes 5-13: edge cross box-normal
    edges = jnp.stack(
        [
            tris[..., 0, :] - tris[..., 1, :],
            tris[..., 0, :] - tris[..., 2, :],
            tris[..., 1, :] - tris[..., 2, :],
        ],
        axis=-2,
    )  # (..., 3, 3)
    eye = jnp.eye(3, dtype=tris.dtype)
    # cross of every edge with every box normal -> (..., 3, 3, 3)
    axes = jnp.cross(edges[..., :, None, :], eye[None, :, :])
    bmin, bmax = _project_minmax(
        corners[..., None, None, :, :], axes
    )
    tmin, tmax = _project_minmax(tris[..., None, None, :, :], axes)
    sep_edges = jnp.any((bmax < tmin) | (bmin > tmax), axis=(-2, -1))

    return ~(sep_box_axes | sep_tri_normal | sep_edges)

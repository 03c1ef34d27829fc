"""Independent eager numpy ray-casting oracle (per-ray, per-triangle loops).

Implements the same double-sided Möller-Trumbore variant as the reference
(reference: src/prim3d/Geometry/triangle.h:18-38) in straightforward scalar
numpy; plays the role of a golden CPU implementation for the XLA/BVH casters.
"""
from __future__ import annotations

import numpy as np

FLT_MAX = np.float32(np.finfo(np.float32).max)


def ray_tri(ro, rd, a, b, c):
    v1v0 = b - a
    v2v0 = c - a
    rov0 = ro - a
    n = np.cross(v1v0, v2v0)
    q = np.cross(rov0, rd)
    denom = np.dot(rd, n)
    if denom == 0:
        return FLT_MAX
    d = 1.0 / denom
    u = d * -np.dot(q, v2v0)
    v = d * np.dot(q, v1v0)
    t = d * -np.dot(n, rov0)
    if u < 0 or u > 1 or v < 0 or (u + v) > 1 or t < 0:
        return FLT_MAX
    return t


def cast_numpy(vertices, faces, origins, dirs, max_dist=10.0):
    vertices = np.asarray(vertices, np.float64)
    faces = np.asarray(faces, np.int64)
    out_t = np.full(len(origins), max_dist, np.float64)
    out_n = np.zeros((len(origins), 3), np.float64)
    out_id = np.full(len(origins), -1, np.int64)
    for r, (ro, rd) in enumerate(zip(origins, dirs)):
        for fi, (i, j, k) in enumerate(faces):
            t = ray_tri(ro, rd, vertices[i], vertices[j], vertices[k])
            if t < out_t[r]:
                out_t[r] = t
                out_id[r] = fi
        if out_id[r] >= 0:
            i, j, k = faces[out_id[r]]
            n = np.cross(
                vertices[j] - vertices[i], vertices[k] - vertices[i]
            )
            out_n[r] = n / max(np.linalg.norm(n), 1e-30)
    return out_t, out_n, out_id


def icosphere(subdiv: int = 2, radius: float = 1.0):
    """Subdivided icosahedron test mesh (verts float64, faces int64)."""
    phi = (1 + 5**0.5) / 2
    v = np.array(
        [
            [-1, phi, 0], [1, phi, 0], [-1, -phi, 0], [1, -phi, 0],
            [0, -1, phi], [0, 1, phi], [0, -1, -phi], [0, 1, -phi],
            [phi, 0, -1], [phi, 0, 1], [-phi, 0, -1], [-phi, 0, 1],
        ],
        np.float64,
    )
    f = np.array(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ],
        np.int64,
    )
    for _ in range(subdiv):
        mid = {}
        nv = list(v)
        nf = []

        def midpoint(a, b):
            key = (min(a, b), max(a, b))
            if key not in mid:
                m = (np.asarray(nv[a]) + np.asarray(nv[b])) / 2
                mid[key] = len(nv)
                nv.append(m)
            return mid[key]

        for a, b, c in f:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            nf += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        v = np.asarray(nv)
        f = np.asarray(nf, np.int64)
    v = v / np.linalg.norm(v, axis=1, keepdims=True) * radius
    return v, f

"""Independent eager numpy marching-cubes oracle.

Plays the role PyMCubes plays for the reference (reference:
prim3d/utility/marching_cubes.py:66-81 wraps mcubes as the CPU oracle;
examples/sphere.py:27-30 asserts parity) — PyMCubes is not available in this
image, so this is a deliberately simple per-cube loop implementation sharing
only the public-domain lookup tables with the production code. Slow; use small
grids.
"""
from __future__ import annotations

import numpy as np

from primitive3d_tpu.ops import mc_tables as T


def marching_cubes_numpy(density: np.ndarray, thresh: float):
    density = np.asarray(density, np.float64)
    X, Y, Z = density.shape
    occ = density > thresh

    # Vertices on crossing lattice edges; id by (axis-major, C-order) to match
    # nothing in particular — parity tests canonicalize.
    vert_id = {}  # (axis, x, y, z) -> id
    verts = []

    def add_vertex(axis, x, y, z):
        key = (axis, x, y, z)
        if key in vert_id:
            return vert_id[key]
        step = [0, 0, 0]
        step[axis] = 1
        d0 = density[x, y, z]
        d1 = density[x + step[0], y + step[1], z + step[2]]
        dt = (thresh - d0) / (d1 - d0)
        p = np.array([x, y, z], np.float64)
        p[axis] += dt
        vert_id[key] = len(verts)
        verts.append(p)
        return vert_id[key]

    faces = []
    corners = T.CORNER_OFFSETS
    for x in range(X - 1):
        for y in range(Y - 1):
            for z in range(Z - 1):
                mask = 0
                for k in range(8):
                    dx, dy, dz = corners[k]
                    if occ[x + dx, y + dy, z + dz]:
                        mask |= 1 << k
                row = T.TRI_TABLE[mask]
                for t in range(0, 16, 3):
                    if row[t] < 0:
                        break
                    ids = []
                    for j in range(3):
                        e = row[t + j]
                        axis = T.EDGE_AXIS[e]
                        ox, oy, oz = T.EDGE_OFFSET[e]
                        ids.append(add_vertex(axis, x + ox, y + oy, z + oz))
                    faces.append(ids)

    verts = np.array(verts, np.float64).reshape(-1, 3)
    faces = np.array(faces, np.int64).reshape(-1, 3)
    return verts, faces

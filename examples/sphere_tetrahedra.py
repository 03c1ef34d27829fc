"""Marching tetrahedra on the sphere tet-mesh fixture
(reference: examples/sphere_tetrahedra.py)."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import primitive3d_tpu as p3d  # noqa: E402

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data",
                    "tetrahedra")

if __name__ == "__main__":
    points = np.load(os.path.join(DATA, "points.npy"))
    sdfs = np.load(os.path.join(DATA, "sdfs.npy"))
    tets = np.load(os.path.join(DATA, "tetrahedras.npy"))

    with p3d.Timer("marching tetrahedra: {:.6f}s"):
        verts, faces = p3d.marching_tetrahedras(points, tets, sdfs)
    print(f"#vertices={verts.shape[0]} #triangles={faces.shape[0]}")
    p3d.save_mesh(verts, faces, filename="sphere_tetrahedra.ply")

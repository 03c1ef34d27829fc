"""Marching cubes on the bunny SDF fixture (reference: examples/bunny_sdf.py)."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import primitive3d_tpu as p3d  # noqa: E402

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data",
                    "bunny.npy")

if __name__ == "__main__":
    grid = np.load(DATA)
    print(f"DENSITY_GRID shape: {grid.shape}")
    with p3d.Timer("tpu marching cubes: {:.6f}s"):
        vertices, faces = p3d.marching_cubes(grid, 0.0, verbose=True)
    with p3d.Timer("save mesh: {:.6f}s"):
        p3d.save_mesh(vertices, faces, filename="bunny.ply")
    # golden parity (captured from the numpy oracle; see tools/gen_goldens.py)
    golden = np.load(
        os.path.join(os.path.dirname(__file__), "..", "tests", "goldens",
                     "bunny_mc.npz")
    )
    assert vertices.shape[0] == golden["v"].shape[0]
    assert faces.shape[0] == golden["f"].shape[0]
    print("golden count parity OK")

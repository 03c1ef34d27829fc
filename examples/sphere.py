"""Marching cubes on an analytic sphere grid (reference: examples/sphere.py).

The reference builds a 200^3 sphere density grid, runs CUDA marching cubes,
asserts count-parity against PyMCubes, and saves a PLY. Here: the XLA op on
whatever device JAX picks, count/canonical parity against the in-repo numpy
oracle on a smaller grid (the pure-Python oracle is slow), and PLY export.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import primitive3d_tpu as p3d  # noqa: E402

N = 200
X, Y, Z = np.mgrid[:N, :N, :N]
# reference convention: inside = density > thresh -> negate the SDF-ish field
DENSITY_GRID = -((X - 50) ** 2 + (Y - 50) ** 2 + (Z - 50) ** 2 - 25**2).astype(
    np.float32
)

if __name__ == "__main__":
    with p3d.Timer("tpu marching cubes: {:.6f}s"):
        vertices, faces = p3d.marching_cubes(DENSITY_GRID, 0.0, verbose=True)
    with p3d.Timer("save mesh: {:.6f}s"):
        p3d.save_mesh(vertices, faces, filename="sphere.ply")

    # parity vs the independent numpy oracle (32^3 to keep the oracle fast)
    from tests.oracles.mc_numpy import marching_cubes_numpy
    from primitive3d_tpu.core.canonical import assert_meshes_equal

    small = DENSITY_GRID[::8, ::8, ::8].copy()
    v_o, f_o = marching_cubes_numpy(small, 0.0)
    v_s, f_s = p3d.marching_cubes(small, 0.0)
    assert v_s.shape[0] == v_o.shape[0] and f_s.shape[0] == f_o.shape[0]
    assert_meshes_equal(np.asarray(v_s), np.asarray(f_s), v_o, f_o)
    print("oracle parity OK")

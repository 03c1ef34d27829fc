"""Intrinsic marching-cubes table validation + global watertightness.

Kills the shared-table circularity called out in round 1: the numpy oracle
(tests/oracles/mc_numpy.py) imports ops.mc_tables, so a table typo would
pass both sides. Here the table is validated from first principles (only
corner/edge geometry — tools/gen_mc_tables.py) and the production pipeline
is checked for global topological invariants no wrong table could satisfy.
"""
import sys

import numpy as np
import pytest

sys.path.insert(0, ".")

from tools.gen_mc_tables import (  # noqa: E402
    check_crossing_and_counts, check_face_consistency, check_orientation)


class TestTableIntrinsic:
    def test_crossing_edges_and_counts(self):
        assert check_crossing_and_counts() == []

    def test_manifold_patches_and_face_seams(self):
        assert check_face_consistency() == []

    def test_orientation_consistent(self):
        assert check_orientation() == []


def euler_and_watertight(v, f):
    """(V - E + F, boundary-edge count, non-manifold-edge count)."""
    f = np.asarray(f)
    # deduplicate vertices (MC emits one vertex per crossing edge; seams
    # between cubes share lattice edges so ids are already unique, but guard
    # against float-identical duplicates anyway)
    v = np.asarray(v)
    edges = {}
    for tri in f:
        for a, b in ((tri[0], tri[1]), (tri[1], tri[2]), (tri[2], tri[0])):
            key = (min(a, b), max(a, b))
            edges[key] = edges.get(key, 0) + 1
    counts = np.array(list(edges.values()))
    boundary = int((counts == 1).sum())
    nonmanifold = int((counts > 2).sum())
    V, E, F = len(v), len(edges), len(f)
    return V - E + F, boundary, nonmanifold


class TestGlobalTopology:
    """Closed isosurfaces from the production pipeline must be watertight
    (every edge in exactly 2 faces) with sphere Euler characteristic."""

    @pytest.mark.parametrize("n,r", [(24, 8.0), (33, 12.0)])
    def test_sphere_watertight(self, n, r):
        import primitive3d_tpu as p3d

        x, y, z = np.mgrid[:n, :n, :n].astype(np.float32)
        c = (n - 1) / 2
        grid = -((x - c) ** 2 + (y - c) ** 2 + (z - c) ** 2 - r * r)
        v, f = p3d.marching_cubes(grid, 0.0)
        v, f = np.asarray(v), np.asarray(f)
        assert len(f) > 0 and f.min() >= 0 and f.max() < len(v)
        chi, boundary, nonmanifold = euler_and_watertight(v, f)
        assert boundary == 0, "closed surface has boundary edges"
        assert nonmanifold == 0, "non-manifold edges"
        assert chi == 2, f"sphere Euler characteristic {chi} != 2"

    def test_random_blob_watertight(self):
        import primitive3d_tpu as p3d

        rng = np.random.default_rng(0)
        n = 20
        # smooth random field, forced negative at the boundary -> closed
        raw = rng.standard_normal((n, n, n)).astype(np.float32)
        for ax in range(3):
            k = np.array([0.25, 0.5, 0.25], np.float32)
            raw = np.apply_along_axis(
                lambda m: np.convolve(m, k, mode="same"), ax, raw)
        x, y, z = np.mgrid[:n, :n, :n].astype(np.float32)
        c = (n - 1) / 2
        envelope = 1.0 - ((x - c) ** 2 + (y - c) ** 2 + (z - c) ** 2) / (c * c)
        grid = raw * 5.0 + envelope * 2.0 - 1.0
        grid[0, :, :] = grid[-1, :, :] = -1.0
        grid[:, 0, :] = grid[:, -1, :] = -1.0
        grid[:, :, 0] = grid[:, :, -1] = -1.0
        v, f = p3d.marching_cubes(grid, 0.0)
        v, f = np.asarray(v), np.asarray(f)
        assert len(f) > 0
        chi, boundary, nonmanifold = euler_and_watertight(v, f)
        assert boundary == 0, "closed surface has boundary edges"
        assert nonmanifold == 0, "non-manifold edges"
        assert chi % 2 == 0  # disjoint closed orientable components

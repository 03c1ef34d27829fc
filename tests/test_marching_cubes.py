"""Marching cubes: numpy-oracle parity, scaling, gradients, padded invariants.

Test strategy modeled on the reference's example-based golden parity
(reference: examples/sphere.py:27-30, examples/bunny_sdf.py:28-31) plus the
unit/gradient coverage the reference lacks (SURVEY.md §4).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from primitive3d_tpu.core.canonical import assert_meshes_equal
from primitive3d_tpu.ops.marching_cubes import (
    marching_cubes,
    marching_cubes_counts,
    marching_cubes_padded,
)
from tests.oracles.mc_numpy import marching_cubes_numpy


def sphere_grid(n=32, c=None, r=None):
    c = n / 2 if c is None else c
    r = n / 4 if r is None else r
    x, y, z = np.mgrid[:n, :n, :n].astype(np.float64)
    return (x - c) ** 2 + (y - c) ** 2 + (z - c) ** 2 - r**2


BUNNY = os.path.join(os.path.dirname(__file__), "..", "examples", "data", "bunny.npy")


class TestParity:
    @pytest.mark.parametrize("n", [8, 16, 32])
    def test_sphere_matches_numpy_oracle(self, n):
        # Reference example uses density > thresh = inside with an SDF-like
        # field that is NEGATIVE inside — same convention here.
        grid = -sphere_grid(n)
        v, f = marching_cubes(grid, 0.0)
        v_ref, f_ref = marching_cubes_numpy(grid, 0.0)
        assert_meshes_equal(np.asarray(v), np.asarray(f), v_ref, f_ref)

    def test_bunny_matches_golden(self):
        # Golden produced by tests/oracles/mc_numpy.py (see tools/gen_goldens.py);
        # stored because the pure-Python oracle takes minutes at 66^3.
        grid = np.load(BUNNY)
        golden = np.load("tests/goldens/bunny_mc.npz")
        v, f = marching_cubes(grid, 0.0)
        assert_meshes_equal(np.asarray(v), np.asarray(f), golden["v"], golden["f"])

    def test_active_capacity_budget(self):
        # a measured active-cube budget reproduces the default result; an
        # undersized one raises the overflow flag instead of silently
        # corrupting faces
        grid = -sphere_grid(24)
        nv, nf = marching_cubes_counts(grid, 0.0)
        ref = marching_cubes_padded(
            grid, 0.0, vert_capacity=4096, face_capacity=8192
        )
        from primitive3d_tpu.ops.marching_cubes import _counts_impl

        na = int(_counts_impl(jnp.asarray(grid, jnp.float32),
                              jnp.float32(0))[4])
        tight = marching_cubes_padded(
            grid, 0.0, vert_capacity=4096, face_capacity=8192,
            active_capacity=na,
        )
        assert not bool(tight.overflowed)
        np.testing.assert_array_equal(
            np.asarray(ref.faces), np.asarray(tight.faces))
        np.testing.assert_allclose(
            np.asarray(ref.vertices), np.asarray(tight.vertices))
        small = marching_cubes_padded(
            grid, 0.0, vert_capacity=4096, face_capacity=8192,
            active_capacity=max(16, na // 4),
        )
        assert bool(small.overflowed)

    def test_cpu_fallback_matches_default(self):
        # the reference's cpu= PyMCubes fallback analog
        # (prim3d/utility/marching_cubes.py:66-81): same implementation on
        # the host CPU backend, same output convention
        grid = -sphere_grid(16)
        v, f = marching_cubes(grid, 0.0)
        vc, fc = marching_cubes(grid, 0.0, cpu=True)
        assert vc.devices() == {jax.devices("cpu")[0]}
        np.testing.assert_array_equal(np.asarray(f), np.asarray(fc))
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(vc), rtol=0, atol=1e-5
        )

    def test_random_grids_match_oracle(self):
        rng = np.random.default_rng(0)
        for _ in range(3):
            grid = rng.standard_normal((9, 7, 11))
            v, f = marching_cubes(grid, 0.1)
            v_ref, f_ref = marching_cubes_numpy(grid, 0.1)
            assert_meshes_equal(np.asarray(v), np.asarray(f), v_ref, f_ref)


class TestCountsAndPadding:
    def test_counts_match_eager(self):
        grid = -sphere_grid(24)
        nv, nf = marching_cubes_counts(jnp.asarray(grid, jnp.float32), 0.0)
        v, f = marching_cubes(grid, 0.0)
        assert int(nv) == v.shape[0]
        assert int(nf) == f.shape[0]

    def test_padded_tail_is_zero_and_jittable(self):
        grid = jnp.asarray(-sphere_grid(16), jnp.float32)
        fn = jax.jit(
            lambda g: marching_cubes_padded(
                g, 0.0, vert_capacity=4096, face_capacity=8192
            )
        )
        res = fn(grid)
        nv, nf = int(res.num_vertices), int(res.num_faces)
        assert not bool(res.overflowed)
        assert np.all(np.asarray(res.vertices[nv:]) == 0)
        assert np.all(np.asarray(res.faces[nf:]) == 0)
        # face indices reference valid vertices
        assert np.asarray(res.faces[:nf]).max() < nv

    def test_overflow_flag(self):
        grid = jnp.asarray(-sphere_grid(16), jnp.float32)
        res = marching_cubes_padded(grid, 0.0, vert_capacity=8, face_capacity=8)
        assert bool(res.overflowed)

    def test_empty_grid(self):
        grid = jnp.ones((8, 8, 8), jnp.float32)  # all inside, no crossing
        v, f = marching_cubes(grid, 0.0)
        assert v.shape[0] == 0 and f.shape[0] == 0

    def test_default_unit_budget_never_truncates(self):
        """Sparse crossings (~1.5 per 128-unit, like the 256^3 flagship
        sphere) must not silently lose geometry under the DEFAULT unit
        budgets — the round-2 heuristic (capacity//8) dropped the +x
        hemisphere of the flagship mesh exactly this way."""
        n = 48
        x, y, z = np.mgrid[:n, :n, :n].astype(np.float32)
        c = n / 2.0
        grid = jnp.asarray(
            -((x - c) ** 2 + (y - c) ** 2 + (z - c) ** 2 - (n / 2.6) ** 2)
        )
        v_ref, f_ref = marching_cubes(grid, 0.0)
        nv_ref = v_ref.shape[0]
        # generous capacities, DEFAULT (unspecified) unit budgets
        res = marching_cubes_padded(
            grid, 0.0,
            vert_capacity=2 * nv_ref, face_capacity=4 * nv_ref,
        )
        assert not bool(res.overflowed)
        nv = int(res.num_vertices)
        assert nv == nv_ref
        got = np.asarray(res.vertices[:nv])
        want = np.asarray(v_ref)
        # same bbox and same vertex set (row-major order matches eager)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


class TestScale:
    def test_scale_conventions(self):
        grid = -sphere_grid(16)
        v0, _ = marching_cubes(grid, 0.0)
        v1, _ = marching_cubes(grid, 0.0, scale=1.0)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v0) / 16.0, atol=1e-6)
        v2, _ = marching_cubes(grid, 0.0, scale=(-1.0, 1.0))
        np.testing.assert_allclose(
            np.asarray(v2), np.asarray(v0) / 8.0 - 1.0, atol=1e-5
        )
        v3, _ = marching_cubes(grid, 0.0, scale=([0.0, 0.0, 0.0], [1.0, 2.0, 4.0]))
        np.testing.assert_allclose(
            np.asarray(v3),
            np.asarray(v0) * np.array([1, 2, 4]) / 16.0,
            atol=1e-5,
        )


class TestGradients:
    def test_vertex_positions_differentiable_wrt_density(self):
        # Offset center/radius so no lattice density is near thresh: finite
        # differences are only meaningful where the perturbation cannot flip
        # edge-crossing topology.
        grid = jnp.asarray(-sphere_grid(8, c=4.49, r=1.93), jnp.float32)
        assert float(jnp.min(jnp.abs(grid))) > 0.5

        def loss(g):
            res = marching_cubes_padded(g, 0.0, vert_capacity=512, face_capacity=1024)
            return jnp.sum(res.vertices**2)

        g = jax.grad(loss)(grid)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0

        # directional-derivative check: <grad, v> vs central differences.
        # (forward-mode jvp is unsupported: the compaction uses a custom_vjp
        # whose backward is a pure gather — see ops/marching_cubes.py.)
        v = np.random.default_rng(1).standard_normal(grid.shape)
        v = jnp.asarray(v / np.abs(v).max(), jnp.float32)
        eps = 0.05
        fd = (float(loss(grid + eps * v)) - float(loss(grid - eps * v))) / (
            2 * eps
        )
        np.testing.assert_allclose(float(jnp.vdot(g, v)), fd, rtol=0.05)

        # finite-difference spot check. eps must be large enough that the FD
        # quotient rises above float32 rounding of the O(1e4) loss (~4e-3 abs),
        # and small enough that topology cannot flip (min |density| > 0.5).
        ga = np.asarray(g)
        idx = np.argwhere(np.abs(ga) > 0.5)[:5]
        eps = 0.2
        for i, j, k in idx:
            gp = np.asarray(grid).copy()
            gp[i, j, k] += eps
            gm = np.asarray(grid).copy()
            gm[i, j, k] -= eps
            fd = (float(loss(jnp.asarray(gp))) - float(loss(jnp.asarray(gm)))) / (
                2 * eps
            )
            assert abs(fd - ga[i, j, k]) < 0.06 * max(1.0, abs(fd)), (
                (i, j, k),
                fd,
                ga[i, j, k],
            )


class TestSoupParity:
    """marching_cubes_soup must emit the exact triangles (values AND order)
    of marching_cubes_padded(...).vertices[faces] — the de-index identity
    the flagship fast path relies on."""

    @pytest.mark.parametrize("n", [16, 33])
    def test_soup_equals_deindexed_mesh(self, n):
        from primitive3d_tpu.ops.marching_cubes import (marching_cubes_padded,
                                                        marching_cubes_soup)

        grid = jnp.asarray(sphere_grid(n, c=n / 2 + 0.31), jnp.float32)
        res = marching_cubes_padded(
            grid, 0.0, vert_capacity=8192, face_capacity=16384,
            lower=(-1, -1, -1), upper=(1, 1, 1))
        nf = int(res.num_faces)
        assert nf > 0 and not bool(res.overflowed)
        ref = np.asarray(res.vertices)[np.asarray(res.faces)]

        sres = marching_cubes_soup(
            grid, 0.0, face_capacity=16384, lower=(-1, -1, -1),
            upper=(1, 1, 1))
        assert int(sres.num_faces) == nf
        assert not bool(sres.overflowed)
        soup = np.asarray(sres.soup)
        np.testing.assert_allclose(soup[:nf], ref[:nf], rtol=1e-6, atol=1e-6)
        assert np.all(soup[nf:] == 0)

    def test_soup_gradient_matches_padded_path(self):
        from primitive3d_tpu.ops.marching_cubes import (marching_cubes_padded,
                                                        marching_cubes_soup)

        grid = jnp.asarray(sphere_grid(16, c=8.29), jnp.float32)

        def loss_soup(g):
            r = marching_cubes_soup(g, 0.0, face_capacity=4096)
            return jnp.sum(r.soup ** 2)

        def loss_deindex(g):
            r = marching_cubes_padded(
                g, 0.0, vert_capacity=2048, face_capacity=4096)
            nf_mask = (jnp.arange(4096) < r.num_faces)[:, None, None]
            tris = jnp.where(nf_mask, r.vertices[r.faces], 0.0)
            return jnp.sum(tris ** 2)

        gs = jax.grad(loss_soup)(grid)
        gd = jax.grad(loss_deindex)(grid)
        np.testing.assert_allclose(
            np.asarray(gs), np.asarray(gd), rtol=1e-4, atol=1e-5)
        assert float(jnp.abs(gs).sum()) > 0


class TestExpandSrc:
    """The sort-free slot -> (item, rank) decoder behind every MC/MT
    compaction and face expansion (round 5). Oracle: explicit Python
    repetition of each item id ``count`` times."""

    def _oracle(self, counts):
        items, ranks = [], []
        for i, c in enumerate(counts):
            items += [i] * int(c)
            ranks += list(range(int(c)))
        return np.asarray(items), np.asarray(ranks)

    def test_randomized_against_oracle(self):
        from primitive3d_tpu.ops.marching_cubes import _expand_src

        rng = np.random.default_rng(5)
        n, cap = 700, 1024  # fixed shapes: one compile for all trials
        fn = jax.jit(lambda c: _expand_src(c, cap))
        for _ in range(8):
            counts = rng.integers(0, 6, n)
            item, rank = fn(jnp.asarray(counts, jnp.int32))
            oi, orank = self._oracle(counts)
            m = min(cap, int(counts.sum()))
            np.testing.assert_array_equal(np.asarray(item)[:m], oi[:m])
            np.testing.assert_array_equal(np.asarray(rank)[:m], orank[:m])

    def test_edge_cases(self):
        from primitive3d_tpu.ops.marching_cubes import _expand_src

        # all-zero counts: slots decode to in-bounds garbage (contract)
        item, rank = _expand_src(jnp.zeros((64,), jnp.int32), 16)
        assert np.asarray(item).min() >= 0 and np.asarray(item).max() < 64
        # single item owning everything; capacity truncation mid-item
        item, rank = _expand_src(jnp.asarray([7], jnp.int32), 5)
        np.testing.assert_array_equal(np.asarray(item), np.zeros(5))
        np.testing.assert_array_equal(np.asarray(rank), np.arange(5))
        # leading/trailing empty items skipped exactly
        counts = jnp.asarray([0, 0, 3, 0, 2, 0], jnp.int32)
        item, rank = _expand_src(counts, 5)
        np.testing.assert_array_equal(np.asarray(item), [2, 2, 2, 4, 4])
        np.testing.assert_array_equal(np.asarray(rank), [0, 1, 2, 0, 1])
        # super-group boundary straddle: item 31 spills into super 1's slots
        counts = np.zeros(64, np.int64)
        counts[31], counts[32], counts[63] = 4, 1, 2
        item, rank = _expand_src(jnp.asarray(counts, jnp.int32), 7)
        np.testing.assert_array_equal(
            np.asarray(item), [31, 31, 31, 31, 32, 63, 63])
        np.testing.assert_array_equal(np.asarray(rank), [0, 1, 2, 3, 0, 0, 1])

    def test_twolevel_src_selection_oracle(self):
        from primitive3d_tpu.ops.marching_cubes import _twolevel_src

        rng = np.random.default_rng(6)
        E, cap = 5000, 512
        fn = jax.jit(lambda m: _twolevel_src(m, cap, 0)[0])
        for density in (0.02, 0.3, 0.9):
            mask = (rng.random(E) < density).astype(np.int8)
            src = np.asarray(fn(jnp.asarray(mask)))
            exp = np.flatnonzero(mask)
            m = min(cap, len(exp))
            np.testing.assert_array_equal(src[:m], exp[:m])

"""Marching tetrahedra: reference-oracle parity, gradients, invariants.

Parity is tested directly against the reference's pure-PyTorch implementation
(reference: prim3d/utility/marching_tetrahedras.py) imported from the
read-only mount, on both the docstring worked example (:119-136) and the
sphere tet-mesh fixture the reference ships (examples/sphere_tetrahedra.py).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from primitive3d_tpu.core.canonical import canonicalize_mesh
from primitive3d_tpu.ops.marching_tetrahedra import (
    marching_tetrahedra,
    marching_tetrahedra_padded,
)
from tests.oracles.mt_reference import load_reference_mt

DATA = os.path.join(os.path.dirname(__file__), "..", "examples", "data", "tetrahedra")


def _ref_mt(verts, tets, sdf, return_tet_idx=False):
    fn = load_reference_mt()
    out = fn(
        torch.from_numpy(np.asarray(verts, np.float32)),
        torch.from_numpy(np.asarray(tets, np.int64)),
        torch.from_numpy(np.asarray(sdf, np.float32)),
        return_tet_idx,
    )
    return tuple(np.asarray(t) for t in out)


class TestWorkedExample:
    """The reference docstring example (marching_tetrahedras.py:119-136)."""

    def setup_method(self):
        self.verts = np.array(
            [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32
        )
        self.tets = np.array([[0, 1, 2, 3]], np.int64)
        self.sdf = np.array([-1.0, -1.0, 0.5, 0.5], np.float32)

    def test_exact_values(self):
        v, f, tid = marching_tetrahedra(
            self.verts, self.tets, self.sdf, return_tet_idx=True
        )
        np.testing.assert_allclose(
            np.asarray(v),
            [[0, 2 / 3, 0], [0, 0, 2 / 3], [1 / 3, 2 / 3, 0], [1 / 3, 0, 2 / 3]],
            atol=1e-6,
        )
        np.testing.assert_array_equal(np.asarray(f), [[3, 0, 1], [3, 2, 0]])
        np.testing.assert_array_equal(np.asarray(tid), [0, 0])

    def test_input_not_mutated(self):
        # the reference flips the caller's tets in place (:148); we must not.
        tets = jnp.asarray(self.tets, jnp.int32)
        orig = np.asarray(tets).copy()
        marching_tetrahedra(self.verts, tets, self.sdf)
        np.testing.assert_array_equal(np.asarray(tets), orig)


class TestReferenceParity:
    def test_sphere_fixture_exact_vertex_parity(self):
        points = np.load(f"{DATA}/points.npy")
        sdfs = np.load(f"{DATA}/sdfs.npy")
        tets = np.load(f"{DATA}/tetrahedras.npy")

        v_ref, f_ref = _ref_mt(points, tets, sdfs)
        v, f = marching_tetrahedra(points, tets, sdfs)
        v, f = np.asarray(v), np.asarray(f)

        # vertex ordering matches the reference exactly (both are
        # lexicographic over unique sorted edge pairs)
        assert v.shape == v_ref.shape
        np.testing.assert_allclose(v, v_ref, atol=1e-5)

        # faces as sets (row order differs: reference groups 1-tri tets first)
        assert f.shape == f_ref.shape
        _, fc = canonicalize_mesh(v, f)
        _, fc_ref = canonicalize_mesh(v_ref, f_ref)
        np.testing.assert_array_equal(fc, fc_ref)

    def test_random_meshes_parity(self):
        rng = np.random.default_rng(0)
        for trial in range(3):
            n = 40
            pts = rng.standard_normal((n, 3)).astype(np.float32)
            tets = rng.integers(0, n, (60, 4))
            # drop degenerate tets (repeated vertices) — ill-defined for MT
            ok = np.array([len(set(t)) == 4 for t in tets])
            tets = tets[ok].astype(np.int64)
            sdf = rng.standard_normal(n).astype(np.float32)
            v_ref, f_ref = _ref_mt(pts, tets, sdf)
            v, f = marching_tetrahedra(pts, tets, sdf)
            v, f = np.asarray(v), np.asarray(f)
            assert v.shape == v_ref.shape and f.shape == f_ref.shape
            np.testing.assert_allclose(v, v_ref, atol=1e-5)
            _, fc = canonicalize_mesh(v, f)
            _, fc_ref = canonicalize_mesh(v_ref, f_ref)
            np.testing.assert_array_equal(fc, fc_ref)


class TestPaddedInvariants:
    def test_jittable_and_padded(self):
        points = np.load(f"{DATA}/points.npy")
        sdfs = np.load(f"{DATA}/sdfs.npy")
        tets = np.load(f"{DATA}/tetrahedras.npy")
        fn = jax.jit(
            lambda v, t, s: marching_tetrahedra_padded(
                v, t, s, vert_capacity=8192, face_capacity=16384
            )
        )
        res = fn(
            jnp.asarray(points), jnp.asarray(tets, jnp.int32), jnp.asarray(sdfs)
        )
        nv, nf = int(res.num_vertices), int(res.num_faces)
        assert not bool(res.overflowed)
        assert np.all(np.asarray(res.vertices[nv:]) == 0)
        assert np.all(np.asarray(res.faces[nf:]) == 0)
        assert np.all(np.asarray(res.tet_idx[nf:]) == -1)
        f_valid = np.asarray(res.faces[:nf])
        assert f_valid.min() >= 0 and f_valid.max() < nv

    def test_no_surface(self):
        verts = np.eye(4, 3, dtype=np.float32) * 2
        tets = np.array([[0, 1, 2, 3]])
        v, f = marching_tetrahedra(verts, tets, np.ones(4, np.float32))
        assert v.shape[0] == 0 and f.shape[0] == 0


class TestGradients:
    def _setup(self):
        points = np.load(f"{DATA}/points.npy")
        sdfs = np.load(f"{DATA}/sdfs.npy")
        tets = np.load(f"{DATA}/tetrahedras.npy")
        return (
            jnp.asarray(points),
            jnp.asarray(tets, jnp.int32),
            jnp.asarray(sdfs),
        )

    def test_grad_wrt_sdf_and_vertices(self):
        points, tets, sdfs = self._setup()

        def loss(p, s):
            res = marching_tetrahedra_padded(
                p, tets, s, vert_capacity=8192, face_capacity=16384
            )
            return jnp.sum(res.vertices ** 2)

        gp, gs = jax.grad(loss, argnums=(0, 1))(points, sdfs)
        assert np.isfinite(np.asarray(gp)).all()
        assert np.isfinite(np.asarray(gs)).all()
        assert float(jnp.abs(gs).sum()) > 0

        # directional-derivative check (forward-mode unsupported through the
        # custom_vjp gather compaction; exact grad parity vs torch is covered
        # by test_grad_matches_torch_reference)
        v1 = jnp.asarray(
            np.random.default_rng(0).standard_normal(points.shape), jnp.float32
        ) * 0.01
        eps = 1.0
        fd = (
            float(loss(points + eps * v1, sdfs))
            - float(loss(points - eps * v1, sdfs))
        ) / (2 * eps)
        np.testing.assert_allclose(float(jnp.vdot(gp, v1)), fd, rtol=0.05)

    def test_grad_matches_torch_reference(self):
        """Gradient parity against the reference implementation under torch."""
        points = np.load(f"{DATA}/points.npy")
        sdfs = np.load(f"{DATA}/sdfs.npy")
        tets_np = np.load(f"{DATA}/tetrahedras.npy")

        # torch reference gradient of sum(verts^2) wrt sdf
        fn = load_reference_mt()
        t_sdf = torch.from_numpy(sdfs).requires_grad_(True)
        t_pts = torch.from_numpy(points).requires_grad_(True)
        v_ref, _ = fn(t_pts, torch.from_numpy(tets_np), t_sdf)
        (v_ref ** 2).sum().backward()

        tets = jnp.asarray(tets_np, jnp.int32)

        def loss(p, s):
            res = marching_tetrahedra_padded(
                p, tets, s, vert_capacity=8192, face_capacity=16384
            )
            return jnp.sum(res.vertices ** 2)

        gp, gs = jax.grad(loss, argnums=(0, 1))(
            jnp.asarray(points), jnp.asarray(sdfs)
        )
        np.testing.assert_allclose(
            np.asarray(gs), t_sdf.grad.numpy(), atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(gp), t_pts.grad.numpy(), atol=2e-3
        )


class TestVmap:
    def test_batched_via_vmap(self):
        """The padded op is vmap-able (the reference only documents batching,
        its code path is unbatched — marching_tetrahedras.py:103-108)."""
        points = np.load(f"{DATA}/points.npy")
        sdfs = np.load(f"{DATA}/sdfs.npy")
        tets = jnp.asarray(np.load(f"{DATA}/tetrahedras.npy"), jnp.int32)

        batch_p = jnp.stack([jnp.asarray(points), jnp.asarray(points) * 1.1])
        batch_s = jnp.stack([jnp.asarray(sdfs), jnp.asarray(sdfs)])

        fn = jax.vmap(
            lambda p, s: marching_tetrahedra_padded(
                p, tets, s, vert_capacity=8192, face_capacity=16384
            )
        )
        res = fn(batch_p, batch_s)
        assert res.vertices.shape == (2, 8192, 3)
        v0, f0 = marching_tetrahedra(points, tets, sdfs)
        nv = int(res.num_vertices[0])
        np.testing.assert_allclose(
            np.asarray(res.vertices[0][:nv]), np.asarray(v0), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(res.vertices[1][:nv]), np.asarray(v0) * 1.1, atol=1e-4
        )


class TestLatticeTier:
    """The analytic (sort-free) Kuhn-lattice tier must be output-identical
    to the general sort tiers on grid_tetrahedra inputs — vertex order,
    face order, windings, tet_idx, counts."""

    def _setup(self, n=12, deform=0.0, seed=3):
        from primitive3d_tpu.ops.marching_tetrahedra import grid_tetrahedra

        pts, tets = grid_tetrahedra(n)
        if deform:
            rng = np.random.default_rng(seed)
            pts = pts + rng.standard_normal(pts.shape).astype(np.float32) \
                * deform
        c = (n - 1) / 2.0
        sdf = ((n / 4.0)
               - np.linalg.norm(pts - c, axis=1)).astype(np.float32)
        return pts, tets, sdf

    @pytest.mark.parametrize("deform", [0.0, 0.15, 0.8])
    def test_matches_sort_tier(self, deform):
        # deform=0.8 flips some cells' orientation — exercises the
        # per-face det path vs _oriented_tets
        from primitive3d_tpu.ops.marching_tetrahedra import (
            _mt_impl_dense, marching_tetrahedra_lattice)

        n = 12
        pts, tets, sdf = self._setup(n, deform)
        rd = _mt_impl_dense(jnp.asarray(pts), jnp.asarray(tets),
                            jnp.asarray(sdf), 2048, 4096)
        rl = marching_tetrahedra_lattice(
            pts, sdf, n, vert_capacity=2048, face_capacity=4096)
        assert int(rd.num_vertices) == int(rl.num_vertices) > 100
        assert int(rd.num_faces) == int(rl.num_faces)
        np.testing.assert_allclose(
            np.asarray(rd.vertices), np.asarray(rl.vertices),
            rtol=1e-6, atol=1e-6)
        np.testing.assert_array_equal(
            np.asarray(rd.faces), np.asarray(rl.faces))
        np.testing.assert_array_equal(
            np.asarray(rd.tet_idx), np.asarray(rl.tet_idx))

    def test_identity_positions(self):
        """vertices=None decodes index-space positions — must equal the
        explicit-lattice-points path exactly (and cost zero gathers)."""
        from primitive3d_tpu.ops.marching_tetrahedra import (
            marching_tetrahedra_lattice)

        n = 10
        pts, _, sdf = self._setup(n)
        ra = marching_tetrahedra_lattice(
            pts, sdf, n, vert_capacity=1024, face_capacity=2048)
        rb = marching_tetrahedra_lattice(
            None, sdf, n, vert_capacity=1024, face_capacity=2048)
        np.testing.assert_allclose(
            np.asarray(ra.vertices), np.asarray(rb.vertices),
            rtol=1e-6, atol=1e-6)
        np.testing.assert_array_equal(
            np.asarray(ra.faces), np.asarray(rb.faces))

    def test_grad_parity_vs_sort_tier(self):
        from primitive3d_tpu.ops.marching_tetrahedra import (
            _mt_impl_dense, marching_tetrahedra_lattice)

        n = 10
        pts, tets, sdf = self._setup(n, deform=0.1)
        ptsj, tetsj, sdfj = (jnp.asarray(pts), jnp.asarray(tets),
                             jnp.asarray(sdf))

        def loss_d(p, s):
            r = _mt_impl_dense(p, tetsj, s, 1024, 2048)
            return jnp.sum(r.vertices ** 2)

        def loss_l(p, s):
            r = marching_tetrahedra_lattice(
                p, s, n, vert_capacity=1024, face_capacity=2048)
            return jnp.sum(r.vertices ** 2)

        gd_p, gd_s = jax.grad(loss_d, argnums=(0, 1))(ptsj, sdfj)
        gl_p, gl_s = jax.grad(loss_l, argnums=(0, 1))(ptsj, sdfj)
        # same math, different backward structure (custom-VJP compaction vs
        # plain autodiff gathers) — tolerance covers f32 scatter-add ordering
        np.testing.assert_allclose(
            np.asarray(gd_s), np.asarray(gl_s), rtol=2e-3, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(gd_p), np.asarray(gl_p), rtol=2e-3, atol=1e-4)
        assert float(jnp.abs(gl_s).sum()) > 0


class TestLayoutTiers:
    def test_dense_and_tmajor_agree(self):
        """The small-T dense tier and the large-T T-major/active-compacted
        tier must produce identical meshes (same vertex ORDER too — both
        number vertices by the lexicographic unique-edge order)."""
        from primitive3d_tpu.ops.marching_tetrahedra import (
            _mt_impl_dense, _mt_impl_tmajor, grid_tetrahedra)

        n = 12
        pts, tets = grid_tetrahedra(n)
        c = (n - 1) / 2.0
        sdf = ((n / 4.0)
               - np.linalg.norm(pts - c, axis=1)).astype(np.float32)
        args = (jnp.asarray(pts), jnp.asarray(tets), jnp.asarray(sdf),
                2048, 4096)
        rd = _mt_impl_dense(*args)
        rt = _mt_impl_tmajor(*args)
        assert int(rd.num_vertices) == int(rt.num_vertices) > 100
        assert int(rd.num_faces) == int(rt.num_faces)
        np.testing.assert_allclose(
            np.asarray(rd.vertices), np.asarray(rt.vertices),
            rtol=1e-6, atol=1e-6)
        np.testing.assert_array_equal(
            np.asarray(rd.faces), np.asarray(rt.faces))
        np.testing.assert_array_equal(
            np.asarray(rd.tet_idx), np.asarray(rt.tet_idx))

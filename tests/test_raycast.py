"""Ray casting: numpy-oracle parity, BVH-vs-bruteforce equivalence, semantics.

The reference has NO ray-casting test or example at all (README.md:49 open
TODO); this coverage is new design per SURVEY.md §4.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from primitive3d_tpu.raycast import BruteForceRayCaster, create_raycaster
from primitive3d_tpu.bvh.caster import BvhRayCaster
from primitive3d_tpu.bvh.lbvh import build_lbvh
from tests.oracles.raycast_numpy import cast_numpy, icosphere


def random_rays(n, rng, spread=2.0):
    o = rng.standard_normal((n, 3)) * spread
    d = rng.standard_normal((n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o.astype(np.float32), d.astype(np.float32)


def rays_at_sphere(n, rng, radius=3.0):
    """Rays from a shell pointing at jittered sphere-interior targets."""
    o = rng.standard_normal((n, 3))
    o = o / np.linalg.norm(o, axis=1, keepdims=True) * radius
    target = rng.standard_normal((n, 3)) * 0.3
    d = target - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o.astype(np.float32), d.astype(np.float32)


class TestBruteForceVsNumpyOracle:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_random_soup(self, seed):
        rng = np.random.default_rng(seed)
        v = rng.standard_normal((30, 3)).astype(np.float32)
        f = rng.integers(0, 30, (40, 3)).astype(np.int32)
        o, d = random_rays(50, rng)
        t_ref, n_ref, id_ref = cast_numpy(v, f, o, d)

        rc = BruteForceRayCaster(v, f)
        hits = rc.cast(o, d)
        np.testing.assert_allclose(np.asarray(hits.depth), t_ref, rtol=2e-5, atol=2e-5)
        np.testing.assert_array_equal(np.asarray(hits.face_id), id_ref)
        np.testing.assert_allclose(np.asarray(hits.normals), n_ref, atol=2e-5)


class TestBvhVsBruteForce:
    @pytest.mark.parametrize("subdiv", [1, 2, 3])
    def test_icosphere(self, subdiv):
        rng = np.random.default_rng(subdiv)
        v, f = icosphere(subdiv)
        o, d = rays_at_sphere(256, rng)
        bf = BruteForceRayCaster(v, f).cast(o, d)
        bvh = BvhRayCaster(v, f).cast(o, d)
        np.testing.assert_allclose(
            np.asarray(bvh.depth), np.asarray(bf.depth), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_array_equal(
            np.asarray(bvh.face_id), np.asarray(bf.face_id)
        )
        np.testing.assert_allclose(
            np.asarray(bvh.normals), np.asarray(bf.normals), atol=1e-5
        )

    def test_random_soup_many(self):
        rng = np.random.default_rng(7)
        v = (rng.standard_normal((200, 3)) * 1.5).astype(np.float32)
        f = rng.integers(0, 200, (500, 3)).astype(np.int32)
        o, d = random_rays(400, rng)
        bf = BruteForceRayCaster(v, f).cast(o, d)
        bvh = BvhRayCaster(v, f).cast(o, d)
        np.testing.assert_allclose(
            np.asarray(bvh.depth), np.asarray(bf.depth), rtol=1e-5, atol=1e-5
        )
        # face ids may differ only on exact-tie depths; require 99%+ equal
        same = np.asarray(bvh.face_id) == np.asarray(bf.face_id)
        assert same.mean() > 0.99


class TestMxuVsBruteForce:
    """The Plücker-matmul caster must agree with the u/v/t formulation."""

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_random_soup(self, seed):
        from primitive3d_tpu.raycast import MxuRayCaster

        rng = np.random.default_rng(seed)
        v = (rng.standard_normal((100, 3)) * 1.5).astype(np.float32)
        f = rng.integers(0, 100, (300, 3)).astype(np.int32)
        o, d = random_rays(300, rng)
        bf = BruteForceRayCaster(v, f).cast(o, d)
        mx = MxuRayCaster(v, f).cast(o, d)
        np.testing.assert_allclose(
            np.asarray(mx.depth), np.asarray(bf.depth), rtol=2e-4, atol=2e-4
        )
        same = np.asarray(mx.face_id) == np.asarray(bf.face_id)
        assert same.mean() > 0.99  # ties / grazing edges may differ

    def test_icosphere(self):
        from primitive3d_tpu.raycast import MxuRayCaster

        rng = np.random.default_rng(5)
        v, f = icosphere(2)
        o, d = rays_at_sphere(256, rng)
        bf = BruteForceRayCaster(v, f).cast(o, d)
        mx = MxuRayCaster(v, f).cast(o, d)
        np.testing.assert_allclose(
            np.asarray(mx.depth), np.asarray(bf.depth), rtol=1e-4, atol=1e-4
        )
        np.testing.assert_array_equal(
            np.asarray(mx.face_id), np.asarray(bf.face_id)
        )


class TestPallasVsBruteForce:
    """Pallas cluster kernel (interpret mode on CPU) vs the oracle."""

    def test_icosphere(self):
        from primitive3d_tpu.raycast import PallasRayCaster

        rng = np.random.default_rng(11)
        v, f = icosphere(2)
        o, d = rays_at_sphere(300, rng)
        bf = BruteForceRayCaster(v, f).cast(o, d)
        pk = PallasRayCaster(v, f).cast(o, d)
        np.testing.assert_allclose(
            np.asarray(pk.depth), np.asarray(bf.depth), rtol=1e-4, atol=1e-4
        )
        same = np.asarray(pk.face_id) == np.asarray(bf.face_id)
        assert same.mean() > 0.99
        # the exact f32 refine makes agreeing winners' depths bit-comparable
        np.testing.assert_allclose(
            np.asarray(pk.depth)[same], np.asarray(bf.depth)[same],
            rtol=1e-6, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(pk.normals)[same],
            np.asarray(bf.normals)[same],
            atol=1e-4,
        )

    def test_random_soup_and_misses(self):
        from primitive3d_tpu.raycast import PallasRayCaster

        rng = np.random.default_rng(12)
        v = (rng.standard_normal((150, 3)) * 1.5).astype(np.float32)
        f = rng.integers(0, 150, (400, 3)).astype(np.int32)
        o, d = random_rays(200, rng)
        bf = BruteForceRayCaster(v, f).cast(o, d)
        pk = PallasRayCaster(v, f).cast(o, d)
        np.testing.assert_allclose(
            np.asarray(pk.depth), np.asarray(bf.depth), rtol=1e-4, atol=1e-4
        )
        # miss rows identical
        np.testing.assert_array_equal(
            np.asarray(pk.face_id) < 0, np.asarray(bf.face_id) < 0
        )


class TestSemantics:
    def test_analytic_sphere_depth(self):
        rng = np.random.default_rng(3)
        v, f = icosphere(3)
        o, d = rays_at_sphere(128, rng, radius=3.0)
        hits = create_raycaster(v, f, backend="bvh").cast(o, d)
        # all rays pass near origin -> hit the unit sphere ~2 units away
        depth = np.asarray(hits.depth)
        assert (depth < 10.0).all()
        # entry point lies on the mesh (|p| ~ 1, icosphere(3) is within 1% of unit)
        p = o + depth[:, None] * d
        r = np.linalg.norm(p, axis=1)
        assert np.all(np.abs(r - 1.0) < 0.02)
        # normals point outward on a sphere
        cos = np.sum(np.asarray(hits.normals) * p, axis=1) / r
        assert np.all(np.abs(cos) > 0.95)

    def test_miss_semantics(self):
        v, f = icosphere(1)
        o = np.array([[5.0, 0, 0], [0, 5.0, 0]], np.float32)
        d = np.array([[1.0, 0, 0], [0, 1.0, 0]], np.float32)  # away from mesh
        for backend in ("bruteforce", "bvh"):
            hits = create_raycaster(v, f, backend=backend).cast(o, d)
            np.testing.assert_allclose(np.asarray(hits.depth), [10.0, 10.0])
            np.testing.assert_array_equal(np.asarray(hits.face_id), [-1, -1])
            np.testing.assert_array_equal(
                np.asarray(hits.normals), np.zeros((2, 3))
            )

    def test_max_dist_cutoff(self):
        v, f = icosphere(1)
        o = np.array([[3.0, 0.01, 0.02]], np.float32)
        d = np.array([[-1.0, 0, 0]], np.float32)
        near = create_raycaster(v, f, backend="bvh", max_dist=1.0).cast(o, d)
        assert int(np.asarray(near.face_id)[0]) == -1
        assert float(np.asarray(near.depth)[0]) == 1.0
        far = create_raycaster(v, f, backend="bvh", max_dist=10.0).cast(o, d)
        assert int(np.asarray(far.face_id)[0]) >= 0

    def test_auto_backend_and_invoke_alias(self):
        import jax
        from primitive3d_tpu.raycast import MxuRayCaster, PallasRayCaster

        v, f = icosphere(1)
        rc = create_raycaster(v, f)  # auto: pallas on TPU, mxu elsewhere
        want = (PallasRayCaster
                if jax.default_backend() in ("tpu", "axon") else MxuRayCaster)
        assert isinstance(rc, want)
        o = np.zeros((4, 3), np.float32)
        d = np.tile(np.array([1.0, 0, 0], np.float32), (4, 1))
        h1 = rc.cast(o, d)
        h2 = rc.invoke(o, d)
        np.testing.assert_array_equal(np.asarray(h1.depth), np.asarray(h2.depth))


class TestLbvhStructure:
    @pytest.mark.parametrize("n", [2, 3, 17, 100])
    def test_tree_invariants(self, n):
        rng = np.random.default_rng(n)
        tris = jnp.asarray(rng.standard_normal((n, 3, 3)), jnp.float32)
        bvh = build_lbvh(tris)
        left = np.asarray(bvh.left)
        right = np.asarray(bvh.right)
        lo = np.asarray(bvh.box_lo)
        hi = np.asarray(bvh.box_hi)
        ts = np.asarray(bvh.tris_sorted)

        # every leaf reachable exactly once by walking from the root
        seen = []
        stack = [0]
        while stack:
            node = stack.pop()
            for c in (left[node], right[node]):
                if c < 0:
                    seen.append(~c)
                else:
                    stack.append(c)
        assert sorted(seen) == list(range(n))

        # node boxes contain their subtree's triangles
        def subtree_leaves(node):
            out, st = [], [node]
            while st:
                m = st.pop()
                for c in (left[m], right[m]):
                    if c < 0:
                        out.append(~c)
                    else:
                        st.append(c)
            return out

        for node in range(n - 1):
            leaves = subtree_leaves(node)
            pts = ts[leaves].reshape(-1, 3)
            assert (pts.min(0) >= lo[node] - 1e-5).all()
            assert (pts.max(0) <= hi[node] + 1e-5).all()

        # prim_order is a permutation
        assert sorted(np.asarray(bvh.prim_order)) == list(range(n))


class TestMxuClusterKernel:
    """The MXU cluster kernel (interpret mode) vs the scalar cluster kernel
    and the brute-force oracle."""

    def test_vs_ordered_kernel_multiblock(self):
        from primitive3d_tpu.bvh.clusters import build_clusters, build_mxu_clusters
        from primitive3d_tpu.kernels.raycast_kernel import (
            MBLOCK, cast_clusters, cast_clusters_mxu)

        rng = np.random.default_rng(23)
        v, f = icosphere(2)
        tris = jnp.asarray(np.asarray(v, np.float32)[np.asarray(f)])
        cb = build_clusters(tris)
        mb = build_mxu_clusters(tris)
        o, d = rays_at_sphere(MBLOCK + 700, rng)  # > 1 MXU ray block
        t0, i0 = cast_clusters(cb, jnp.asarray(o), jnp.asarray(d),
                               interpret=True)
        t1, i1 = cast_clusters_mxu(mb, jnp.asarray(o), jnp.asarray(d),
                                   interpret=True)
        # Where the kernels pick the same triangle, depths must agree to the
        # MXU path's documented precision; a <1% sliver of grazing rays may
        # resolve to a different (equally close) triangle under the bf16
        # hi/lo product error, so those only need loose depth agreement.
        same = np.asarray(i1) == np.asarray(i0)
        assert same.mean() > 0.99
        err = np.abs(np.asarray(t1) - np.asarray(t0)) / (
            np.abs(np.asarray(t0)) + 1e-6)
        assert np.quantile(err[same], 0.999) < 2e-4
        np.testing.assert_allclose(np.asarray(t1), np.asarray(t0),
                                   rtol=5e-3, atol=5e-3)

    def test_caster_with_misses(self):
        from primitive3d_tpu.raycast import PallasRayCaster

        rng = np.random.default_rng(24)
        v, f = icosphere(2)
        o, d = random_rays(300, rng)
        bf = BruteForceRayCaster(v, f).cast(o, d)
        caster = PallasRayCaster(v, f)
        assert caster.use_mxu
        pk = caster.cast(o, d)
        np.testing.assert_allclose(
            np.asarray(pk.depth), np.asarray(bf.depth), rtol=2e-4, atol=2e-4
        )
        np.testing.assert_array_equal(
            np.asarray(pk.face_id) < 0, np.asarray(bf.face_id) < 0
        )
        same = np.asarray(pk.face_id) == np.asarray(bf.face_id)
        assert same.mean() > 0.99
        # exact f32 refine: agreeing winners bit-comparable to the oracle
        np.testing.assert_allclose(
            np.asarray(pk.depth)[same], np.asarray(bf.depth)[same],
            rtol=1e-6, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(pk.normals)[same], np.asarray(bf.normals)[same],
            atol=1e-4,
        )

    def test_max_dist(self):
        from primitive3d_tpu.bvh.clusters import build_mxu_clusters
        from primitive3d_tpu.kernels.raycast_kernel import cast_clusters_mxu

        v, f = icosphere(1)
        tris = jnp.asarray(np.asarray(v, np.float32)[np.asarray(f)])
        mb = build_mxu_clusters(tris)
        o = jnp.asarray([[3.0, 0.01, 0.02]], jnp.float32)
        d = jnp.asarray([[-1.0, 0.0, 0.0]], jnp.float32)
        t, i = cast_clusters_mxu(mb, o, d, max_dist=1.0, interpret=True)
        assert int(np.asarray(i)[0]) == -1
        assert float(np.asarray(t)[0]) == 1.0

    def test_stream_matches_resident(self):
        """HBM-streaming variant (per-cluster DMA) must match bit-exactly."""
        from primitive3d_tpu.bvh.clusters import build_mxu_clusters
        from primitive3d_tpu.kernels.raycast_kernel import cast_clusters_mxu

        rng = np.random.default_rng(42)
        v, f = icosphere(2)
        tris = jnp.asarray(np.asarray(v, np.float32)[np.asarray(f)])
        mb = build_mxu_clusters(tris)
        o, d = rays_at_sphere(700, rng)
        o, d = jnp.asarray(o), jnp.asarray(d)
        t0, i0 = cast_clusters_mxu(mb, o, d, interpret=True)
        t1, i1 = cast_clusters_mxu(mb, o, d, interpret=True, stream=True)
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(t0))
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i0))

    def test_stream_convergence_edge_cases(self):
        """Front-to-back + per-chunk convergence must stay EXACT for origins
        inside the mesh (negative entry bounds), all-miss ray sets (no chunk
        ever converges), and tight max_dist cutoffs."""
        from primitive3d_tpu.bvh.clusters import build_mxu_clusters
        from primitive3d_tpu.kernels.raycast_kernel import cast_clusters_mxu

        rng = np.random.default_rng(7)
        v, f = icosphere(2)
        tris = jnp.asarray(np.asarray(v, np.float32)[np.asarray(f)])
        mb = build_mxu_clusters(tris)

        cases = []
        # origins inside the sphere, random outward directions
        d_in = rng.normal(size=(300, 3)).astype(np.float32)
        d_in /= np.linalg.norm(d_in, axis=1, keepdims=True)
        cases.append((np.zeros((300, 3), np.float32)
                      + rng.uniform(-0.3, 0.3, (300, 3)).astype(np.float32),
                      d_in, 10.0))
        # all-miss: rays pointing away from the mesh
        o_away = np.full((257, 3), 5.0, np.float32)
        d_away = np.tile(np.asarray([[1.0, 0.0, 0.0]], np.float32), (257, 1))
        cases.append((o_away, d_away, 10.0))
        # tight max_dist: some hits become misses mid-traversal
        o_h, d_h = rays_at_sphere(400, rng)
        cases.append((np.asarray(o_h), np.asarray(d_h), 2.05))

        for o, d, md in cases:
            o, d = jnp.asarray(o), jnp.asarray(d)
            t0, i0 = cast_clusters_mxu(mb, o, d, max_dist=md, interpret=True)
            t1, i1 = cast_clusters_mxu(mb, o, d, max_dist=md, interpret=True,
                                       stream=True)
            np.testing.assert_array_equal(np.asarray(t1), np.asarray(t0))
            np.testing.assert_array_equal(np.asarray(i1), np.asarray(i0))


class TestDifferentiableClusterCast:
    """cast_clusters_diff: kernel hit-finding + analytic depth gradient."""

    def test_depth_matches_and_grad_flows(self):
        import jax
        from primitive3d_tpu.kernels.raycast_kernel import cast_clusters_diff
        from primitive3d_tpu.raycast import BruteForceRayCaster

        rng = np.random.default_rng(31)
        v, f = icosphere(2)
        tris = jnp.asarray(np.asarray(v, np.float32)[np.asarray(f)])
        o, d = rays_at_sphere(300, rng)
        o, d = jnp.asarray(o), jnp.asarray(d)
        bf = BruteForceRayCaster(v, f).cast(o, d)

        depth, idx = cast_clusters_diff(tris, o, d, interpret=True)
        np.testing.assert_allclose(
            np.asarray(depth), np.asarray(bf.depth), rtol=2e-4, atol=2e-4
        )

        # gradient wrt triangle vertices: finite-difference check on the
        # mean depth (hit assignment fixed, plane depth differentiable)
        def loss(t):
            dd, _ = cast_clusters_diff(t, o, d, interpret=True)
            return jnp.mean(dd)

        g = jax.grad(loss)(tris)
        g = np.asarray(g)
        assert np.isfinite(g).all() and np.abs(g).sum() > 0
        eps = 1e-3
        flat = g.reshape(-1)
        k = int(np.argmax(np.abs(flat)))
        pert = np.zeros(g.size, np.float32)
        pert[k] = eps
        pert = pert.reshape(g.shape)
        l0 = float(loss(tris - jnp.asarray(pert)))
        l1 = float(loss(tris + jnp.asarray(pert)))
        fd = (l1 - l0) / (2 * eps)
        assert abs(fd - flat[k]) < 0.05 * max(abs(fd), abs(flat[k]))


class TestPallasOrderedVariant:
    def test_ordered_equals_unordered(self):
        from primitive3d_tpu.bvh.clusters import build_clusters
        from primitive3d_tpu.kernels.raycast_kernel import cast_clusters
        import jax.numpy as jnp

        rng = np.random.default_rng(21)
        v, f = icosphere(2)
        tris = jnp.asarray(np.asarray(v, np.float32)[np.asarray(f)])
        cb = build_clusters(tris)
        o, d = rays_at_sphere(1500, rng)  # > 1 ray block
        t0, i0 = cast_clusters(cb, jnp.asarray(o), jnp.asarray(d),
                               interpret=True, ordered=False)
        t1, i1 = cast_clusters(cb, jnp.asarray(o), jnp.asarray(d),
                               interpret=True, ordered=True)
        np.testing.assert_allclose(np.asarray(t1), np.asarray(t0), atol=1e-6)
        # equal-depth ties may resolve to a different (coplanar) triangle
        # under a different cluster visit order
        same = np.asarray(i1) == np.asarray(i0)
        assert same.mean() > 0.99


class TestConfig:
    def test_caster_from_config(self):
        from primitive3d_tpu.core.config import Config, RayCastConfig
        from primitive3d_tpu.raycast import (BruteForceRayCaster,
                                             PallasRayCaster)

        v, f = icosphere(1)
        cfg = Config(raycast=RayCastConfig(backend="bruteforce", max_dist=3.0))
        rc = create_raycaster(v, f, config=cfg.raycast)
        assert isinstance(rc, BruteForceRayCaster)
        assert rc.max_dist == 3.0
        # explicit argument overrides the config
        rc2 = create_raycaster(v, f, backend="pallas", config=cfg.raycast)
        assert isinstance(rc2, PallasRayCaster)
        assert rc2.max_dist == 3.0

    def test_mc_padded_from_config(self):
        import primitive3d_tpu as p3d
        from primitive3d_tpu.core.config import MarchingCubesConfig

        n = 8
        x, y, z = np.mgrid[:n, :n, :n].astype(np.float32)
        c = (n - 1) / 2
        grid = -((x - c) ** 2 + (y - c) ** 2 + (z - c) ** 2 - 4.0)
        cfg = MarchingCubesConfig(vert_capacity=512, face_capacity=1024)
        res = p3d.marching_cubes_padded(grid, 0.0, config=cfg)
        assert res.vertices.shape == (512, 3)
        assert res.faces.shape == (1024, 3)
        assert int(res.num_faces) > 0
        with pytest.raises(ValueError):
            p3d.marching_cubes_padded(grid, 0.0)


class TestInKernelFinish:
    """with_fin=True: the kernel selects the winner's finish row (normal,
    plane offset, 1/|n|, original face id) via an exact one-hot bf16x3
    matmul, so the caster's epilogue is pure elementwise math — the
    full-buffer production path (reference writes depth/normal/id in one
    kernel pass, bvh.cu:330-345)."""

    @pytest.mark.parametrize("stream", [False, True])
    @pytest.mark.parametrize("order", ["morton", "identity"])
    def test_fin_rows_match_gather_epilogue(self, stream, order):
        from primitive3d_tpu.bvh.clusters import build_mxu_clusters
        from primitive3d_tpu.kernels.raycast_kernel import cast_clusters_mxu
        from primitive3d_tpu.raycast import (_finish_data, _finish_hits,
                                             _finish_hits_fin)

        rng = np.random.default_rng(99)
        v, f = icosphere(2)
        tris = jnp.asarray(np.asarray(v, np.float32)[np.asarray(f)])
        mb = build_mxu_clusters(tris, order=order)
        o, d = rays_at_sphere(700, rng)
        o, d = jnp.asarray(o), jnp.asarray(d)
        t2, i2 = cast_clusters_mxu(mb, o, d, interpret=True, stream=stream)
        t, i, finr = cast_clusters_mxu(
            mb, o, d, interpret=True, stream=stream, with_fin=True)
        # fin selection must not perturb the hit finding at all
        np.testing.assert_array_equal(np.asarray(t), np.asarray(t2))
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i2))

        fast = _finish_hits_fin(finr, t, i, o, d, max_dist=10.0)
        ref = _finish_hits(_finish_data(tris), mb.prim_order, t, i, o, d,
                           max_dist=10.0)
        # the gather epilogue and the in-kernel selection read the same
        # per-face data -> identical ids, f32-faithful depth/normals
        np.testing.assert_array_equal(
            np.asarray(fast.face_id), np.asarray(ref.face_id))
        np.testing.assert_allclose(
            np.asarray(fast.depth), np.asarray(ref.depth),
            rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(fast.normals), np.asarray(ref.normals), atol=1e-5)

    def test_identity_order_prim_is_iota(self):
        from primitive3d_tpu.bvh.clusters import build_mxu_clusters

        v, f = icosphere(1)
        tris = jnp.asarray(np.asarray(v, np.float32)[np.asarray(f)])
        mb = build_mxu_clusters(tris, order="identity")
        T = tris.shape[0]
        po = np.asarray(mb.prim_order)
        np.testing.assert_array_equal(po[:T], np.arange(T))
        assert (po[T:] == -1).all()

    def test_fin_fid_exact_at_large_ids(self):
        """Integer face ids survive the bf16x3 split exactly (< 2^24)."""
        from primitive3d_tpu.bvh.clusters import build_mxu_clusters

        v, f = icosphere(2)
        tris = jnp.asarray(np.asarray(v, np.float32)[np.asarray(f)])
        mb = build_mxu_clusters(tris)
        fin = np.asarray(mb.fin, np.float32)  # (C, 24, S)
        rows = fin[:, 0:8] + fin[:, 8:16] + fin[:, 16:24]
        fid = rows[:, 5].reshape(-1)
        np.testing.assert_array_equal(
            fid, np.asarray(mb.prim_order, np.float32))


class TestDiffCastBackward:
    """Gradients of the differentiable cast must not depend on the kernel
    tier: the streaming tier (work-list scatter kernel backward) and the
    resident tier (XLA scatter-add backward) must produce the same
    plane/soup gradients."""

    def test_grad_parity_stream_vs_resident(self):
        from primitive3d_tpu.kernels.raycast_kernel import cast_clusters_diff

        rng = np.random.default_rng(5)
        v, f = icosphere(3)
        tris0 = jnp.asarray(np.asarray(v, np.float32)[np.asarray(f)])
        T = tris0.shape[0]
        o, d = rays_at_sphere(2300, rng)  # > 1 MXU block
        o, d = jnp.asarray(o), jnp.asarray(d)

        def loss(ts, cap):
            # cap < T forces the streaming tier; identity order + ws kernel
            dep, _ = cast_clusters_diff(
                ts, o, d, max_dist=10.0, interpret=True, mxu_max_tris=cap)
            return jnp.sum(dep * dep)

        # stream tier (cap tiny) vs resident tier
        g_ws = jax.grad(lambda ts: loss(ts, 64))(tris0)
        g_ref = jax.grad(lambda ts: loss(ts, T + 1))(tris0)
        # identical hit assignments (stream == resident bit-exact), so the
        # two backward implementations see the same cotangents; tolerance
        # covers f32 accumulation-order noise only
        np.testing.assert_allclose(
            np.asarray(g_ws), np.asarray(g_ref), rtol=1e-4, atol=2e-5)
        assert float(jnp.sum(jnp.abs(g_ws))) > 0


class TestEdgeWildcard:
    """A ray exactly through a shared triangle edge produces exactly-zero
    Plücker side products. Default sign-bit agreement misses both adjacent
    triangles (documented caveat); edge_wildcard=True treats exact zeros
    as agreeing with any sign and hits. Grid-aligned cameras against MC
    meshes are the realistic trigger."""

    # unit quad split along the v0-v2 diagonal under several windings: the
    # default crack depends on whether the exact-zero product rounds to +0
    # or -0 (accumulation-order dependent), but the wildcard guarantee must
    # hold for ALL of them. Dyadic coordinates keep the double-bf16
    # products exact.
    WINDINGS = [
        [[0, 1, 2], [0, 2, 3]],
        [[2, 1, 0], [3, 2, 0]],
        [[0, 1, 2], [3, 2, 0]],
        [[2, 1, 0], [0, 2, 3]],
    ]

    def _quad(self, f):
        v = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]],
                     np.float32)
        tris = jnp.asarray(v[np.asarray(f, np.int32)])
        # through the diagonal's midpoint — ON the shared edge
        o = jnp.asarray([[0.5, 0.5, -1.0]], jnp.float32)
        d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
        return tris, o, d

    @pytest.mark.parametrize("stream", [False, True])
    @pytest.mark.parametrize("winding", range(4))
    def test_wildcard_hits_shared_edge(self, stream, winding):
        from primitive3d_tpu.bvh.clusters import build_mxu_clusters
        from primitive3d_tpu.kernels.raycast_kernel import cast_clusters_mxu

        tris, o, d = self._quad(self.WINDINGS[winding])
        bvh = build_mxu_clusters(tris)
        depth, sidx = cast_clusters_mxu(
            bvh, o, d, interpret=True, stream=stream, edge_wildcard=True)
        assert int(sidx[0]) >= 0
        np.testing.assert_allclose(float(depth[0]), 1.0, rtol=1e-5)

    def test_wildcard_caster_parity_on_generic_rays(self):
        """edge_wildcard must not change results for generic rays."""
        from primitive3d_tpu.raycast import create_raycaster
        from primitive3d_tpu.core.config import RayCastConfig

        v, f = icosphere(2)
        rng = np.random.default_rng(11)
        o = (rng.standard_normal((512, 3)) * 2).astype(np.float32)
        d = rng.standard_normal((512, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        rc0 = create_raycaster(v, f, backend="pallas")
        rc1 = create_raycaster(
            v, f, backend="pallas",
            config=RayCastConfig(edge_wildcard=True))
        h0 = rc0.cast(o, d)
        h1 = rc1.cast(o, d)
        np.testing.assert_array_equal(
            np.asarray(h0.face_id), np.asarray(h1.face_id))
        np.testing.assert_allclose(
            np.asarray(h0.depth), np.asarray(h1.depth), rtol=1e-6)


class TestAutoClusterSize:
    def test_small_mesh_keeps_128(self):
        from primitive3d_tpu.raycast import PallasRayCaster

        v, f = icosphere(1)
        rc = PallasRayCaster(v, f)
        assert rc.cbvh.cluster_size == 128
        # stream cap derives from the work-word id limit
        assert rc.use_mxu and not rc.mxu_stream

    def test_explicit_cluster_size_wins(self):
        from primitive3d_tpu.raycast import PallasRayCaster

        v, f = icosphere(2)
        rc = PallasRayCaster(v, f, cluster_size=256)
        assert rc.cbvh.cluster_size == 256

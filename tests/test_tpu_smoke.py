"""TPU smoke lane: the Pallas kernels compiled through Mosaic, on real chips.

The default suite runs every Pallas kernel in interpreter mode on CPU, which
cannot catch Mosaic lowering regressions (e.g. the 66^3 fused-mask crash
class fixed in commit e0547cf). This marked subset runs the same kernels
COMPILED on the real device once per round:

    PRIM3D_TEST_PLATFORM=axon python -m pytest tests -m tpu -q

Skipped automatically when the session platform is not a TPU. Shapes are kept
small so compiles stay in the tens of seconds through the remote tunnel.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.tpu


def _require_tpu():
    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("TPU smoke lane requires a real TPU "
                    "(set PRIM3D_TEST_PLATFORM=axon)")


@pytest.fixture(scope="module")
def scene():
    _require_tpu()
    from tests.oracles.raycast_numpy import icosphere

    v, f = icosphere(2)
    tris = jnp.asarray(np.asarray(v, np.float32)[np.asarray(f)])
    rng = np.random.default_rng(7)
    R = 4096
    o = (rng.standard_normal((R, 3)) * 2).astype(np.float32)
    d = rng.standard_normal((R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    from primitive3d_tpu.raycast import _cast_bruteforce

    ref = _cast_bruteforce(tris, jnp.asarray(o), jnp.asarray(d),
                           jnp.float32(10.0), 512)
    return tris, jnp.asarray(o), jnp.asarray(d), ref


def _check(depth, sidx, prim_order, ref):
    prim = np.asarray(prim_order)[np.maximum(np.asarray(sidx), 0)]
    face = np.where(np.asarray(sidx) >= 0, prim, -1)
    np.testing.assert_array_equal(face, np.asarray(ref.face_id))
    hit = face >= 0
    # RAW kernel depth is ordering-accurate, not f32-exact: the double-bf16
    # Plücker products carry ~2^-16 relative error AMPLIFIED by
    # |moment| / |triangle normal| (far origins, small triangles), ~1e-3
    # worst-case for this scene. Production refines winners to exact f32
    # (raycast._finish_hits) — asserted at 2e-5 in the caster-level test.
    np.testing.assert_allclose(
        np.asarray(depth)[hit], np.asarray(ref.depth)[hit], rtol=2e-3
    )


class TestMosaicKernels:
    def test_mxu_cluster_kernel_compiled(self, scene):
        from primitive3d_tpu.bvh.clusters import build_mxu_clusters
        from primitive3d_tpu.kernels.raycast_kernel import cast_clusters_mxu

        tris, o, d, ref = scene
        bvh = build_mxu_clusters(tris)
        depth, sidx = cast_clusters_mxu(bvh, o, d, interpret=False)
        _check(depth, sidx, bvh.prim_order, ref)

    def test_mxu_cluster_kernel_streamed(self, scene):
        from primitive3d_tpu.bvh.clusters import build_mxu_clusters
        from primitive3d_tpu.kernels.raycast_kernel import cast_clusters_mxu

        tris, o, d, ref = scene
        bvh = build_mxu_clusters(tris)
        depth, sidx = cast_clusters_mxu(
            bvh, o, d, interpret=False, stream=True
        )
        _check(depth, sidx, bvh.prim_order, ref)

    def test_pallas_caster_refined_depth(self, scene):
        """The production path (kernel + exact-f32 winner refine) must match
        the brute-force oracle tightly, compiled on the real chip."""
        from primitive3d_tpu.raycast import create_raycaster

        tris, o, d, ref = scene
        rc = create_raycaster(
            tris.reshape(-1, 3), np.arange(tris.shape[0] * 3,
                                           dtype=np.int32).reshape(-1, 3),
            backend="pallas",
        )
        hits = rc.cast(o, d)
        np.testing.assert_array_equal(
            np.asarray(hits.face_id), np.asarray(ref.face_id))
        hit = np.asarray(ref.face_id) >= 0
        np.testing.assert_allclose(
            np.asarray(hits.depth)[hit], np.asarray(ref.depth)[hit],
            rtol=2e-5,
        )

    def test_scalar_cluster_kernel_compiled(self, scene):
        from primitive3d_tpu.bvh.clusters import build_clusters
        from primitive3d_tpu.kernels.raycast_kernel import cast_clusters

        tris, o, d, ref = scene
        bvh = build_clusters(tris)
        depth, sidx = cast_clusters(bvh, o, d, interpret=False)
        _check(depth, sidx, bvh.prim_order, ref)

    def test_fused_mc_masks_compiled(self):
        """66^3 bunny counts via the fused Pallas mask kernel == goldens
        (the shape class that crashed Mosaic before commit e0547cf)."""
        _require_tpu()
        import primitive3d_tpu as p3d

        grid = jnp.asarray(np.load(os.path.join(
            os.path.dirname(__file__), "..", "examples", "data",
            "bunny.npy")))
        v, f = p3d.marching_cubes(grid, 0.0)
        g = np.load("tests/goldens/bunny_mc.npz")
        assert v.shape[0] == g["v"].shape[0]
        assert f.shape[0] == g["f"].shape[0]


def test_grad_parity_stream_vs_resident_on_chip(scene):
    """Compiled (Mosaic) gradient parity: streaming-tier work-list backward
    vs the resident tier's exact f32 scatter-add. The interpret-mode twin in
    test_raycast.py cannot catch MXU precision loss — this is the hardware
    check for the round-5 fix pinning the plane-cotangent dot to
    Precision.HIGHEST (f32 operands at DEFAULT run one bf16 pass)."""
    from primitive3d_tpu.kernels.raycast_kernel import cast_clusters_diff

    tris, o, d, _ = scene
    T = tris.shape[0]

    def loss(ts, cap):
        dep, _ = cast_clusters_diff(
            ts, o, d, max_dist=10.0, interpret=False, mxu_max_tris=cap)
        return jnp.sum(dep * dep)

    g_ws = jax.jit(jax.grad(lambda ts: loss(ts, 64)))(tris)
    g_ref = jax.jit(jax.grad(lambda ts: loss(ts, T + 1)))(tris)
    np.testing.assert_allclose(
        np.asarray(g_ws), np.asarray(g_ref), rtol=1e-4, atol=2e-5)
    assert float(jnp.sum(jnp.abs(g_ws))) > 0


def test_mc_512_grid_smoke():
    """512^3 extraction: the edge mask is 4e8 elements — the natural next
    scale after the flagship's 256^3 (and past the int32-exactness traps of
    the scan/decode machinery). Reduced-region sphere so tight capacities
    stay modest; asserts no overflow and exact counts."""
    _require_tpu()
    from primitive3d_tpu.ops.marching_cubes import (_counts_impl,
                                                    marching_cubes_padded)

    n = 512
    ax = jnp.linspace(-1.0, 1.0, n)
    x, y, z = jnp.meshgrid(ax, ax, ax, indexing="ij")
    d = 0.25 - jnp.sqrt(x * x + y * y + z * z)  # small sphere, ~fewer verts

    nv, nf, vu, cu, na = (int(q) for q in _counts_impl(d, jnp.float32(0)))
    assert nv > 0 and nf > 0
    r4k = lambda q: -(-int(q * 1.05) // 4096) * 4096
    res = marching_cubes_padded(
        d, 0.0, vert_capacity=r4k(nv), face_capacity=r4k(nf),
        vert_units=r4k(vu), cube_units=r4k(cu), active_capacity=r4k(na),
        lower=(-1, -1, -1), upper=(1, 1, 1),
    )
    assert not bool(res.overflowed)
    v = np.asarray(res.vertices)
    nz = int((np.abs(v).sum(1) > 0).sum())
    assert abs(nz - nv) <= 1  # vertex exactly at the origin would zero-sum
    f = np.asarray(res.faces)
    assert f.max() < r4k(nv)
    # surface sanity: all vertices on the r=0.25 sphere
    r = np.linalg.norm(v[: nv], axis=1)
    assert np.all(np.abs(r - 0.25) < 0.01)

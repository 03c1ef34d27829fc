"""TPU smoke lane: the Pallas kernels compiled through Mosaic, on real chips.

The default suite runs every Pallas kernel in interpreter mode on CPU, which
cannot catch Mosaic lowering regressions (e.g. the 66^3 fused-mask crash
class fixed in commit e0547cf). This marked subset runs the same kernels
COMPILED on the real device once per round:

    PRIM3D_TEST_PLATFORM=axon python -m pytest tests -m tpu -q

Skipped automatically when the session platform is not a TPU. Shapes are kept
small so compiles stay in the tens of seconds through the remote tunnel.
"""
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
    np.testing.assert_allclose(
        np.asarray(depth)[hit], np.asarray(ref.depth)[hit], rtol=2e-5
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

        grid = jnp.asarray(np.load("/root/reference/examples/data/bunny.npy"))
        v, f = p3d.marching_cubes(grid, 0.0)
        g = np.load("tests/goldens/bunny_mc.npz")
        assert v.shape[0] == g["v"].shape[0]
        assert f.shape[0] == g["f"].shape[0]

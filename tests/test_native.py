"""Native C++ runtime: LBVH parity with the JAX build, raycast parity, PLY."""
import numpy as np
import pytest

from primitive3d_tpu import native
from primitive3d_tpu.io.ply import load_mesh, save_mesh
from primitive3d_tpu.raycast import BruteForceRayCaster
from tests.oracles.raycast_numpy import icosphere

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def test_native_lbvh_invariants():
    rng = np.random.default_rng(0)
    tris = rng.standard_normal((100, 3, 3)).astype(np.float32)
    bvh = native.build_lbvh(tris)
    left, right = np.asarray(bvh.left), np.asarray(bvh.right)
    seen, stack = [], [0]
    while stack:
        n = stack.pop()
        for c in (left[n], right[n]):
            (seen.append(~c) if c < 0 else stack.append(c))
    assert sorted(seen) == list(range(100))
    assert sorted(np.asarray(bvh.prim_order)) == list(range(100))
    # escape-threaded walk also visits every leaf once
    DONE = 1 << 30
    node, leaves = 0, []
    while node != DONE:
        if node < 0:
            leaves.append(~node)
            node = bvh.escape_leaf[~node]
        else:
            node = left[node]  # always descend: full preorder walk
    assert sorted(leaves) == list(range(100))


def test_native_raycast_matches_bruteforce():
    rng = np.random.default_rng(1)
    v, f = icosphere(2)
    tris = np.asarray(v, np.float32)[f]
    bvh = native.build_lbvh(tris)
    o = (rng.standard_normal((200, 3)) * 3).astype(np.float32)
    d = rng.standard_normal((200, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    depth, normals, fid = native.raycast(bvh, o, d)

    ref = BruteForceRayCaster(v, f).cast(o, d)
    np.testing.assert_allclose(depth, np.asarray(ref.depth), rtol=1e-5, atol=1e-5)
    same = fid == np.asarray(ref.face_id)
    assert same.mean() > 0.99
    np.testing.assert_allclose(
        normals[same], np.asarray(ref.normals)[same], atol=1e-5
    )


def test_native_ply_byte_identical(tmp_path):
    rng = np.random.default_rng(2)
    v = rng.standard_normal((10, 3)).astype(np.float32)
    f = rng.integers(0, 10, (7, 3)).astype(np.int32)
    c = rng.integers(0, 255, (10, 3)).astype(np.uint8)
    py_path = tmp_path / "py.ply"
    nat_path = tmp_path / "nat.ply"
    save_mesh(v, f, c, filename=py_path)
    native.save_ply(nat_path, v, f, c)
    assert py_path.read_bytes() == nat_path.read_bytes()
    v2, f2, c2 = load_mesh(nat_path)
    np.testing.assert_array_equal(v, v2)
    np.testing.assert_array_equal(f, f2)
    np.testing.assert_array_equal(c, c2)

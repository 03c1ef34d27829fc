"""PLY export/import: round trip, format bytes, reference-parity coercions."""
import numpy as np
import pytest

from primitive3d_tpu.io.ply import load_mesh, save_mesh


@pytest.fixture
def mesh():
    rng = np.random.default_rng(0)
    v = rng.standard_normal((10, 3)).astype(np.float32)
    f = rng.integers(0, 10, (7, 3)).astype(np.int32)
    return v, f


def test_round_trip(tmp_path, mesh):
    v, f = mesh
    path = tmp_path / "m.ply"
    save_mesh(v, f, filename=path)
    v2, f2, c2 = load_mesh(path)
    np.testing.assert_array_equal(v, v2)
    np.testing.assert_array_equal(f, f2)
    assert (c2 == 127).all()  # default gray (reference: marching_cubes.py:128)


def test_colors_and_jax_inputs(tmp_path, mesh):
    import jax.numpy as jnp

    v, f = mesh
    colors = np.arange(30, dtype=np.int64).reshape(10, 3)
    path = tmp_path / "m.ply"
    save_mesh(jnp.asarray(v), jnp.asarray(f), colors, filename=path)
    _, _, c2 = load_mesh(path)
    np.testing.assert_array_equal(c2, colors.astype(np.uint8))


def test_header_format_matches_reference(tmp_path, mesh):
    v, f = mesh
    path = tmp_path / "m.ply"
    save_mesh(v, f, filename=path)
    head = path.read_bytes()[:400].decode("ascii", "replace")
    # exact header the reference emits (marching_cubes.cu:317-330)
    for line in [
        "ply", "format binary_little_endian 1.0", "element vertex 10",
        "property float x", "property uchar red", "element face 7",
        "property list int int vertex_index", "end_header",
    ]:
        assert line in head
    # file size: header + 15 B/vertex + 16 B/face
    end = path.read_bytes().index(b"end_header\n") + 11
    assert path.stat().st_size == end + 10 * 15 + 7 * 16


def test_non_ply_rejected(tmp_path, mesh):
    v, f = mesh
    with pytest.raises(NotImplementedError):
        save_mesh(v, f, filename=tmp_path / "m.obj")


def test_color_shape_mismatch(tmp_path, mesh):
    v, f = mesh
    with pytest.raises(ValueError):
        save_mesh(v, f, np.zeros((3, 3)), filename=tmp_path / "m.ply")

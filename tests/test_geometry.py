"""Unit tests for the geometry layer (triangle + AABB vectorised ops)."""
import jax.numpy as jnp
import numpy as np
import pytest

from primitive3d_tpu.geometry import aabb, triangle as tri


class TestTriangle:
    def test_hit_and_params(self):
        t = jnp.asarray([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], jnp.float32)
        ro = jnp.asarray([0.2, 0.2, -1.0])
        rd = jnp.asarray([0.0, 0.0, 1.0])
        d = tri.ray_intersect(ro, rd, t[0])
        assert abs(float(d) - 1.0) < 1e-6

    def test_double_sided(self):
        t = jnp.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], jnp.float32)
        d = tri.ray_intersect(
            jnp.asarray([0.2, 0.2, 1.0]), jnp.asarray([0.0, 0.0, -1.0]), t
        )
        assert abs(float(d) - 1.0) < 1e-6  # hit from behind too

    def test_miss_outside_and_behind(self):
        t = jnp.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], jnp.float32)
        miss1 = tri.ray_intersect(
            jnp.asarray([2.0, 2.0, -1.0]), jnp.asarray([0.0, 0.0, 1.0]), t
        )
        miss2 = tri.ray_intersect(  # triangle behind origin
            jnp.asarray([0.2, 0.2, 1.0]), jnp.asarray([0.0, 0.0, 1.0]), t
        )
        assert float(miss1) == float(tri.MISS)
        assert float(miss2) == float(tri.MISS)

    def test_degenerate_is_miss(self):
        t = jnp.zeros((3, 3), jnp.float32)
        d = tri.ray_intersect(
            jnp.asarray([0.0, 0.0, -1.0]), jnp.asarray([0.0, 0.0, 1.0]), t
        )
        assert float(d) == float(tri.MISS)

    def test_normals_and_centroids(self):
        t = jnp.asarray([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], jnp.float32)
        np.testing.assert_allclose(np.asarray(tri.normals(t))[0], [0, 0, 1])
        np.testing.assert_allclose(
            np.asarray(tri.centroids(t))[0], [1 / 3, 1 / 3, 0], atol=1e-7
        )


class TestAabb:
    def box(self, lo, hi):
        return jnp.asarray([lo, hi], jnp.float32)

    def test_slab_hit_miss(self):
        b = self.box([0, 0, 0], [1, 1, 1])
        hit = aabb.ray_intersect(
            b, jnp.asarray([0.5, 0.5, -1.0]), jnp.asarray([0.0, 0.0, 1.0])
        )
        np.testing.assert_allclose(np.asarray(hit), [1.0, 2.0], atol=1e-6)
        miss = aabb.ray_intersect(
            b, jnp.asarray([2.0, 2.0, -1.0]), jnp.asarray([0.0, 0.0, 1.0])
        )
        assert float(miss[0]) == float(aabb.MISS)

    def test_axis_parallel_ray(self):
        b = self.box([0, 0, 0], [1, 1, 1])
        # ray along x at y=z=0.5, dir has zero y/z components
        hit = aabb.ray_intersect(
            b, jnp.asarray([-1.0, 0.5, 0.5]), jnp.asarray([1.0, 0.0, 0.0])
        )
        np.testing.assert_allclose(np.asarray(hit), [1.0, 2.0], atol=1e-6)

    def test_contains_distance(self):
        b = self.box([0, 0, 0], [1, 1, 1])
        assert bool(aabb.contains(b, jnp.asarray([0.5, 0.5, 0.5])))
        assert not bool(aabb.contains(b, jnp.asarray([1.5, 0.5, 0.5])))
        np.testing.assert_allclose(
            float(aabb.distance_sq(b, jnp.asarray([2.0, 0.5, 0.5]))), 1.0
        )

    def test_box_box(self):
        a = self.box([0, 0, 0], [1, 1, 1])
        b = self.box([0.5, 0.5, 0.5], [2, 2, 2])
        c = self.box([2, 2, 2], [3, 3, 3])
        assert bool(aabb.intersects(a, b))
        assert not bool(aabb.intersects(a, c))

    def test_union_inflate_relative(self):
        a = self.box([0, 0, 0], [1, 1, 1])
        b = self.box([-1, 0, 0], [0.5, 2, 1])
        u = aabb.union(a, b)
        np.testing.assert_allclose(np.asarray(u[0]), [-1, 0, 0])
        np.testing.assert_allclose(np.asarray(u[1]), [1, 2, 1])
        inf = aabb.inflate(a, 0.5)
        np.testing.assert_allclose(np.asarray(inf[0]), [-0.5] * 3)
        rp = aabb.relative_pos(a, jnp.asarray([0.25, 0.5, 1.0]))
        np.testing.assert_allclose(np.asarray(rp), [0.25, 0.5, 1.0])

    def test_sat_triangle_overlap(self):
        b = self.box([0, 0, 0], [1, 1, 1])
        inside = jnp.asarray(
            [[0.2, 0.2, 0.2], [0.8, 0.2, 0.2], [0.2, 0.8, 0.2]], jnp.float32
        )
        outside = inside + 5.0
        piercing = jnp.asarray(  # crosses the box but no vertex inside
            [[-1, 0.5, 0.5], [2, 0.5, 0.5], [2, 0.5, 1.5]], jnp.float32
        )
        assert bool(aabb.intersects_triangle(b, inside))
        assert not bool(aabb.intersects_triangle(b, outside))
        assert bool(aabb.intersects_triangle(b, piercing))

    def test_sat_matches_sampling(self):
        """Randomised SAT check against dense point sampling."""
        rng = np.random.default_rng(0)
        b = self.box([0, 0, 0], [1, 1, 1])
        agree = 0
        total = 40
        for _ in range(total):
            t = rng.uniform(-1.5, 2.5, (3, 3)).astype(np.float32)
            # sample the triangle densely; overlap if any sample in the box
            u = rng.uniform(0, 1, (512, 2))
            u = np.where(u.sum(1, keepdims=True) > 1, 1 - u, u)
            pts = t[0] + u[:, :1] * (t[1] - t[0]) + u[:, 1:] * (t[2] - t[0])
            sampled = bool(
                ((pts >= 0) & (pts <= 1)).all(axis=1).any()
            )
            sat = bool(aabb.intersects_triangle(b, jnp.asarray(t)))
            # SAT is exact; sampling can only miss thin overlaps
            if sampled:
                assert sat
            agree += sat == sampled
        assert agree >= total - 5  # sampling misses only grazing cases

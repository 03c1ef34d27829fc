"""core.debug: opt-in checkify assertion layer (the sanitizer analog).

The reference's only runtime guards are device printf warnings (reference:
src/prim3d/Utility/marching_cubes.cu:204-206, src/prim3d/Geometry/bvh.h:22-24)
that never fail the computation; here violated invariants raise.
"""
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from primitive3d_tpu.core import debug
from primitive3d_tpu.ops.marching_cubes import marching_cubes_padded
from primitive3d_tpu.ops.marching_tetrahedra import marching_tetrahedra_padded
from primitive3d_tpu.raycast import create_raycaster


def sphere_grid(n=24, r=0.6):
    ax = np.linspace(-1, 1, n, dtype=np.float32)
    x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
    return jnp.asarray(r - np.sqrt(x * x + y * y + z * z))


class TestDebugLayer:
    def test_noop_by_default(self):
        # production path: checks trace to nothing, results unaffected
        g = sphere_grid()
        res = marching_cubes_padded(g, 0.0, vert_capacity=16, face_capacity=16)
        assert bool(res.overflowed)  # silently truncated, as documented

    def test_mc_overflow_raises_under_checks(self):
        g = sphere_grid()

        def run(grid):
            return marching_cubes_padded(
                grid, 0.0, vert_capacity=16, face_capacity=16
            ).vertices

        with pytest.raises(Exception, match="capacity overflow"):
            debug.checked(run)(g)

    def test_mc_ok_under_checks(self):
        g = sphere_grid()

        def run(grid):
            return marching_cubes_padded(
                grid, 0.0, vert_capacity=4096, face_capacity=8192
            ).vertices

        v = debug.checked(run)(g)
        assert np.isfinite(np.asarray(v)).all()

    def test_mt_bad_index_raises(self):
        verts = jnp.asarray(np.random.RandomState(0).randn(8, 3), jnp.float32)
        sdf = jnp.asarray(np.linspace(-1, 1, 8), jnp.float32)
        tets = jnp.asarray([[0, 1, 2, 99]], jnp.int32)  # out of range

        def run(v, t, s):
            return marching_tetrahedra_padded(
                v, t, s, vert_capacity=16, face_capacity=16
            ).vertices

        with pytest.raises(Exception, match="out of range"):
            debug.checked(run)(verts, tets, sdf)

    def test_raycast_nan_origin_raises(self):
        v = jnp.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], jnp.float32)
        f = jnp.asarray([[0, 1, 2]], jnp.int32)
        rc = create_raycaster(v, f, backend="bruteforce")
        o = jnp.asarray([[np.nan, 0, 0]], jnp.float32)
        d = jnp.asarray([[0, 0, 1]], jnp.float32)

        with pytest.raises(Exception, match="non-finite"):
            debug.checked(lambda oo: rc.cast(oo, d).depth)(o)

    def test_raycast_zero_dir_raises(self):
        v = jnp.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], jnp.float32)
        f = jnp.asarray([[0, 1, 2]], jnp.int32)
        rc = create_raycaster(v, f, backend="bvh")
        o = jnp.zeros((4, 3), jnp.float32)
        d = jnp.zeros((4, 3), jnp.float32)

        with pytest.raises(Exception, match="zero-length"):
            debug.checked(lambda oo: rc.cast(oo, d).depth)(o)

    def test_scope_is_trace_time(self):
        # a function traced OUTSIDE the scope keeps no checks even when
        # called inside one
        def f(x):
            debug.check(jnp.all(x > 0), "positive")
            return x * 2

        jitted = jax.jit(f)
        _ = jitted(jnp.float32(-1.0))  # traced with checks off
        with debug.checks():
            out = jitted(jnp.float32(-3.0))  # cached trace: no check
        assert float(out) == -6.0


def test_lint_clean():
    """tools/lint.py over the repo is the de-facto CI format gate."""
    proc = subprocess.run(
        [sys.executable, "tools/lint.py"],
        capture_output=True, text=True, cwd=".", timeout=120,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr

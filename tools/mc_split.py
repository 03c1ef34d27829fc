"""Time marching-cubes internals at flagship scale (256^3, tight budgets).

Identifies which stage of _mc_padded_impl dominates: masks+scan ids,
two-level vertex selection, sparse positions, or the face emission gathers.
Usage: python tools/mc_split.py  (run on the chip; serialize with other TPU
work).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/prim3d_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from tools.flagship_probe import VC, FC, slope_time, sphere_density, tight_units


def log(*a):
    print(f"[{time.perf_counter():8.1f}s]", *a, flush=True)


def main():
    from primitive3d_tpu.kernels.mc_masks import fused_masks
    from primitive3d_tpu.ops.marching_cubes import (
        _edge_ids, _excl_cumsum_flat, _expand_src, _ntris_vec,
        _selected_positions, _twolevel_src, _unit_view, marching_cubes_padded)

    print("device:", jax.devices()[0])
    d = sphere_density()
    nv, nf, vu, cu, na = tight_units(d)
    log(f"counts: {nv} verts {nf} faces, units {vu}/{cu}")
    X = Y = Z = d.shape[0]

    # -- a) masks kernel ---------------------------------------------------
    @jax.jit
    def masks(dd):
        cx, cy, cz, cm = fused_masks(dd, jnp.float32(0))
        return (cx.reshape(-1)[:1].astype(jnp.int32)
                + cm.reshape(-1)[:1].astype(jnp.int32))

    masks(d)
    log(f"masks kernel: {slope_time(lambda: masks(d), 5)*1e3:.1f} ms")

    # -- b) edge-id prefix scans ------------------------------------------
    @jax.jit
    def ids(dd):
        cx, cy, cz, _ = fused_masks(dd, jnp.float32(0))
        ix, iy, iz = _edge_ids(cx, cy, cz)
        return ix.reshape(-1)[-1] + iy.reshape(-1)[-1] + iz.reshape(-1)[-1]

    ids(d)
    log(f"masks + edge-id scans: {slope_time(lambda: ids(d), 5)*1e3:.1f} ms")

    # -- c) vertex two-level selection ------------------------------------
    @jax.jit
    def vsel(dd):
        cx, cy, cz, _ = fused_masks(dd, jnp.float32(0))
        mask_flat = jnp.concatenate(
            [c.reshape(-1) for c in (cx, cy, cz)]
        ).astype(jnp.int8)
        m2v, ucnt = _unit_view(mask_flat)
        src, _ = _twolevel_src(mask_flat, VC, vu, m2=m2v, ucnt=ucnt)
        return src[:1] + src[-1:]

    vsel(d)
    log(f"masks + vert select: {slope_time(lambda: vsel(d), 5)*1e3:.1f} ms")

    # -- d) + sparse positions --------------------------------------------
    @jax.jit
    def vpos(dd):
        cx, cy, cz, _ = fused_masks(dd, jnp.float32(0))
        mask_flat = jnp.concatenate(
            [c.reshape(-1) for c in (cx, cy, cz)]
        ).astype(jnp.int8)
        m2v, ucnt = _unit_view(mask_flat)
        src, _ = _twolevel_src(mask_flat, VC, vu, m2=m2v, ucnt=ucnt)
        valid = jnp.arange(VC, dtype=jnp.int32) < jnp.sum(ucnt)
        p = _selected_positions(
            dd, jnp.float32(0), src, valid,
            jnp.full((3,), 2.0 / X, jnp.float32),
            jnp.full((3,), -1.0, jnp.float32),
        )
        return p[0, :1] + p[0, -1:]

    vpos(d)
    log(f"masks + vert select + pos: {slope_time(lambda: vpos(d), 5)*1e3:.1f} ms")

    # -- e) face subsections ----------------------------------------------
    from primitive3d_tpu.ops.marching_cubes import _unit_view as _uv

    def face_common(dd):
        _, _, _, cm = fused_masks(dd, jnp.float32(0))
        mask = cm.reshape(-1).astype(jnp.int32)
        ntris = _ntris_vec(mask)
        amask = (ntris > 0).astype(jnp.int8)
        m2c, ucnt_c = _uv(amask)
        asrc, _ = _twolevel_src(amask, na, cu, m2=m2c, ucnt=ucnt_c)
        n_active = jnp.sum(ucnt_c)
        valid_a = jnp.arange(na, dtype=jnp.int32) < n_active
        ntris_a = jnp.where(valid_a, ntris[asrc], 0)
        base_a = _excl_cumsum_flat(ntris_a)
        return mask, asrc, base_a, base_a + ntris_a

    @jax.jit
    def fsel(dd):
        mask, asrc, base_a, incl_a = face_common(dd)
        return asrc[:1] + incl_a[-1:]

    fsel(dd=d)
    log(f"masks + active select: {slope_time(lambda: fsel(d), 5)*1e3:.1f} ms")

    @jax.jit
    def fsearch(dd):
        mask, asrc, base_a, incl_a = face_common(dd)
        apos, k = _expand_src(incl_a - base_a, FC)
        cube = asrc[apos]
        return cube[:1] + cube[-1:] + k[-1:]

    fsearch(d)
    log("masks + active select + slot decode: "
        f"{slope_time(lambda: fsearch(d), 5)*1e3:.1f} ms")

    # -- f) full padded MC -------------------------------------------------
    @jax.jit
    def full(dd):
        r = marching_cubes_padded(
            dd, 0.0, vert_capacity=VC, face_capacity=FC,
            lower=(-1, -1, -1), upper=(1, 1, 1),
            vert_units=vu, cube_units=cu, active_capacity=na,
        )
        return (jnp.sum(r.vertices[:, 0])
                + jnp.sum(r.faces[:, 0]).astype(jnp.float32))

    full(d)
    log(f"full padded MC: {slope_time(lambda: full(d), 5)*1e3:.1f} ms")


if __name__ == "__main__":
    main()

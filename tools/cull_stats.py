"""Measure work-list statistics for the flagship-scale cast.

Usage: python tools/cull_stats.py
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

from tools.flagship_probe import sphere_density, log


def main():
    from primitive3d_tpu.ops.marching_cubes import marching_cubes_padded
    from primitive3d_tpu.bvh.clusters import build_mxu_clusters
    from primitive3d_tpu.kernels.raycast_kernel import (
        _interval_cull, MBLOCK, NCH, RCHUNK)
    from primitive3d_tpu.render.camera import camera_rays

    d = sphere_density()
    FC = 401408
    res = marching_cubes_padded(
        d, 0.0, vert_capacity=FC // 2 + 16_384, face_capacity=FC,
        lower=(-1, -1, -1), upper=(1, 1, 1),
    )
    tris = res.vertices[res.faces]
    bvh = build_mxu_clusters(tris)
    log("clusters:", bvh.num_clusters)

    cam = camera_rays(1088, 1920, (0.0, 0.0, 2.5), (0.0, 0.0, 0.0))
    o, dirs = jnp.asarray(cam.origins), jnp.asarray(cam.dirs)
    R = o.shape[0]
    pad = (-R) % MBLOCK
    o = jnp.concatenate([o, jnp.zeros((pad, 3), jnp.float32)])
    dd = jnp.concatenate([dirs, jnp.ones((pad, 3), jnp.float32)])
    Rp = R + pad
    B = Rp // MBLOCK

    @jax.jit
    def stats(o, dd):
        ob = o.reshape(B, NCH, RCHUNK, 3)
        db = dd.reshape(B, NCH, RCHUNK, 3)
        ivb = jnp.clip(1.0 / db, -1e18, 1e18)
        oint = jnp.stack(
            [jnp.min(ob, axis=2), jnp.max(ob, axis=2)], axis=-1
        ).reshape(B, NCH, 6)
        ivint = jnp.stack(
            [jnp.min(ivb, axis=2), jnp.max(ivb, axis=2)], axis=-1
        ).reshape(B, NCH, 6)
        rint = jnp.concatenate([oint, ivint], axis=-1)
        ok, _ = _interval_cull(bvh.boxes, rint, 10.0)
        nondeg = jnp.any(bvh.boxes[:, 3:] > bvh.boxes[:, :3], axis=-1)
        ok = ok & nondeg[None, None, :]

        # exact per-ray slab test, OR-reduced per chunk, for comparison
        lo = bvh.boxes[:, :3]
        hi = bvh.boxes[:, 3:]

        def chunk_exact(oc, dc):
            iv = jnp.clip(1.0 / dc, -1e18, 1e18)
            t0 = (lo[None, :, :] - oc[:, None, :]) * iv[:, None, :]
            t1 = (hi[None, :, :] - oc[:, None, :]) * iv[:, None, :]
            tmn = jnp.max(jnp.minimum(t0, t1), axis=-1)
            tmx = jnp.min(jnp.maximum(t0, t1), axis=-1)
            hitb = (tmn <= tmx) & (tmx >= 0.0) & (tmn < 10.0)
            return jnp.any(hitb, axis=0)  # (C,)

        # sample the middle block only (exact test is expensive)
        mid = B // 2
        ex = jax.vmap(chunk_exact)(ob[mid], db[mid])  # (NCH, C)
        ex = ex & nondeg[None, :]
        return ok, ex

    ok, ex = stats(o, dd)
    ok = np.asarray(ok)
    ex = np.asarray(ex)
    per_block = ok.sum(axis=(1, 2))
    log(f"pairs/block: mean {per_block.mean():.1f}  p50 "
        f"{np.percentile(per_block, 50):.0f}  p95 "
        f"{np.percentile(per_block, 95):.0f}  max {per_block.max()}")
    log(f"total visits: {per_block.sum()}")
    mid = ok.shape[0] // 2
    log(f"mid block: interval {ok[mid].sum(axis=1)} exact {ex.sum(axis=1)}")
    nd = np.asarray(
        jnp.any(bvh.boxes[:, 3:] > bvh.boxes[:, :3], axis=-1))
    log(f"nondeg clusters: {nd.sum()}/{nd.size}")
    # how many clusters does each chunk's *hit* actually need? depth order
    # stats: count clusters passing exact test
    log(f"exact clusters/chunk (mid block): {ex.sum(axis=1)}")


if __name__ == "__main__":
    main()

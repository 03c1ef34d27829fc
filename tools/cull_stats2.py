"""Find where the interval cull over-approximates at flagship scale."""
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

    cam = camera_rays(1088, 1920, (0.0, 0.0, 2.5), (0.0, 0.0, 0.0))
    o, dirs = jnp.asarray(cam.origins), jnp.asarray(cam.dirs)
    R = o.shape[0]
    pad = (-R) % MBLOCK
    o = jnp.concatenate([o, jnp.zeros((pad, 3), jnp.float32)])
    dd = jnp.concatenate([dirs, jnp.ones((pad, 3), jnp.float32)])
    Rp = R + pad
    B = Rp // MBLOCK

    ob = o.reshape(B, NCH, RCHUNK, 3)
    db = dd.reshape(B, NCH, RCHUNK, 3)

    @jax.jit
    def flags(ob, db):
        ivb = jnp.clip(1.0 / db, -1e18, 1e18)
        oint = jnp.stack(
            [jnp.min(ob, axis=2), jnp.max(ob, axis=2)], axis=-1
        ).reshape(B, NCH, 6)
        ivint = jnp.stack(
            [jnp.min(ivb, axis=2), jnp.max(ivb, axis=2)], axis=-1
        ).reshape(B, NCH, 6)
        rint = jnp.concatenate([oint, ivint], axis=-1)
        ok = _interval_cull(bvh.boxes, rint, 10.0)
        nondeg = jnp.any(bvh.boxes[:, 3:] > bvh.boxes[:, :3], axis=-1)
        return ok & nondeg[None, None, :]

    ok = np.asarray(flags(ob, db))  # (B, NCH, C)
    per_chunk = ok.sum(axis=2)  # (B, NCH)
    worst = np.unravel_index(np.argmax(per_chunk), per_chunk.shape)
    log("worst chunk:", worst, "visits", per_chunk[worst])

    # exact per-ray count for that chunk
    bi, ci = worst
    oc = np.asarray(ob[bi, ci])
    dc = np.asarray(db[bi, ci])
    lo = np.asarray(bvh.boxes[:, :3])
    hi = np.asarray(bvh.boxes[:, 3:])
    iv = np.clip(1.0 / dc, -1e18, 1e18)
    t0 = (lo[None, :, :] - oc[:, None, :]) * iv[:, None, :]
    t1 = (hi[None, :, :] - oc[:, None, :]) * iv[:, None, :]
    tmn = np.max(np.minimum(t0, t1), axis=-1)
    tmx = np.min(np.maximum(t0, t1), axis=-1)
    exact = ((tmn <= tmx) & (tmx >= 0) & (tmn < 10)).any(axis=0)
    log("exact for worst chunk:", exact.sum())
    log("dir ranges x", dc[:, 0].min(), dc[:, 0].max(),
        "y", dc[:, 1].min(), dc[:, 1].max(),
        "z", dc[:, 2].min(), dc[:, 2].max())
    log("origin:", oc[0])

    # distribution of chunk counts and how many straddle zero per axis
    straddle = ((np.asarray(db).min(axis=2) < 0)
                & (np.asarray(db).max(axis=2) > 0))  # (B, NCH, 3)
    anystraddle = straddle.any(axis=2)
    log("chunks straddling zero in some dir axis:",
        anystraddle.mean().round(4))
    log("mean visits straddling:", per_chunk[anystraddle].mean(),
        " not:", per_chunk[~anystraddle].mean())
    log("chunk visit percentiles:",
        np.percentile(per_chunk, [50, 90, 99]).round(0),
        "max", per_chunk.max())


if __name__ == "__main__":
    main()

"""Cluster box quality at flagship scale."""
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/prim3d_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from tools.flagship_probe import sphere_density, log


def main():
    from primitive3d_tpu.ops.marching_cubes import marching_cubes_padded
    from primitive3d_tpu.bvh.clusters import build_mxu_clusters

    d = sphere_density()
    FC = 401408
    res = marching_cubes_padded(
        d, 0.0, vert_capacity=FC // 2 + 16_384, face_capacity=FC,
        lower=(-1, -1, -1), upper=(1, 1, 1),
    )
    tris = res.vertices[res.faces]
    bvh = build_mxu_clusters(tris)
    boxes = np.asarray(bvh.boxes)
    ext = boxes[:, 3:] - boxes[:, :3]
    nd = (ext > 0).any(axis=1)
    diag = np.linalg.norm(ext[nd], axis=1)
    log(f"nondeg {nd.sum()}  diag p50 {np.percentile(diag,50):.4f} "
        f"p90 {np.percentile(diag,90):.4f} p99 {np.percentile(diag,99):.4f} "
        f"max {diag.max():.4f}  (sphere diameter = 1.6)")
    # how much box volume vs ideal patch
    log(f"extent per axis p50 {np.percentile(ext[nd],50,axis=0)}")
    # num faces actual
    log("faces:", int(res.num_faces))
    # what if we only count tris that are real (non-padding)?
    prim = np.asarray(bvh.prim_order)
    npad = (prim < 0).sum()
    log("padding tris:", npad)


if __name__ == "__main__":
    main()

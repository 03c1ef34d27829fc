"""Probe flagship-scale pieces on the real chip, one step at a time.

Usage: python tools/flagship_probe.py <stage>
  counts  - exact MC counts for the 256^3 sphere SDF
  cast    - streamed MXU cast of 1080p rays vs the extracted mesh
  step    - full differentiable training step (MC + cast + grad)
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


def log(*a):
    print(f"[{time.perf_counter():8.1f}s]", *a, flush=True)


def sphere_density(n=256, r=0.8):
    ax = jnp.linspace(-1.0, 1.0, n)
    x, y, z = jnp.meshgrid(ax, ax, ax, indexing="ij")
    return r - jnp.sqrt(x * x + y * y + z * z)


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "counts"
    print("device:", jax.devices()[0])
    d = sphere_density()

    if stage == "counts":
        from primitive3d_tpu.ops.marching_cubes import marching_cubes_padded
        # generous capacities just for counting
        res = marching_cubes_padded(
            d, 0.0, vert_capacity=600_000, face_capacity=1_200_000,
            lower=(-1, -1, -1), upper=(1, 1, 1),
        )
        nv = int(res.num_vertices)
        nf = int(res.num_faces)
        print(f"256^3 sphere: {nv} verts, {nf} faces")
        return

    if stage == "cast":
        from primitive3d_tpu.ops.marching_cubes import marching_cubes_padded
        from primitive3d_tpu.bvh.clusters import build_mxu_clusters
        from primitive3d_tpu.kernels.raycast_kernel import cast_clusters_mxu
        from primitive3d_tpu.render.camera import camera_rays

        FC = int(sys.argv[2]) if len(sys.argv) > 2 else 400_000
        res = marching_cubes_padded(
            d, 0.0, vert_capacity=FC // 2 + 16_384, face_capacity=FC,
            lower=(-1, -1, -1), upper=(1, 1, 1),
        )
        tris = res.vertices[res.faces]
        log("faces:", int(res.num_faces), "capacity:", FC)
        bvh = build_mxu_clusters(tris)
        np.asarray(bvh.w2[0, 0, :1])
        log("clusters:", bvh.num_clusters,
            "w2 MB:", bvh.w2.size * 2 / 1e6)
        cam = camera_rays(1088, 1920, (0.0, 0.0, 2.5), (0.0, 0.0, 0.0))
        o, dirs = jnp.asarray(cam.origins), jnp.asarray(cam.dirs)
        log("rays:", o.shape[0])
        t0 = time.perf_counter()
        depth, idx = cast_clusters_mxu(bvh, o, dirs, max_dist=10.0,
                                       stream=True)
        np.asarray(depth[:8])
        log("compile+run1:", time.perf_counter() - t0, "s")
        t0 = time.perf_counter()
        N = 5
        for _ in range(N):
            depth, idx = cast_clusters_mxu(bvh, o, dirs, max_dist=10.0,
                                           stream=True)
        np.asarray(depth[:8])
        dt = (time.perf_counter() - t0) / N
        R = o.shape[0]
        hits = int(jnp.sum(idx >= 0))
        print(f"cast 1080p: {dt*1e3:.2f} ms = {R/dt/1e6:.1f} Mrays/s, "
              f"hit fraction {hits/R:.3f}")
        return

    if stage == "step":
        from primitive3d_tpu.pipeline import sdf_fitting_loss
        from primitive3d_tpu.render.camera import camera_rays

        FC = int(sys.argv[2]) if len(sys.argv) > 2 else 400_000
        cam = camera_rays(1088, 1920, (0.0, 0.0, 2.5), (0.0, 0.0, 0.0))
        o, dirs = jnp.asarray(cam.origins), jnp.asarray(cam.dirs)
        target = jnp.full((o.shape[0],), 1.7, jnp.float32)

        lossf = jax.jit(jax.value_and_grad(
            lambda dd: sdf_fitting_loss(
                dd, o, dirs, target, thresh=0.0,
                vert_capacity=FC // 2 + 16_384, face_capacity=FC,
                lower=(-1, -1, -1), upper=(1, 1, 1), max_dist=10.0,
                backend="pallas",
            )
        ))
        t0 = time.perf_counter()
        loss, g = lossf(d)
        np.asarray(loss)
        print("compile+run1:", time.perf_counter() - t0, "s")
        t0 = time.perf_counter()
        N = 3
        for _ in range(N):
            loss, g = lossf(d)
        np.asarray(loss)
        dt = (time.perf_counter() - t0) / N
        print(f"flagship step: {dt*1e3:.1f} ms, loss={float(loss):.4f}, "
              f"|g|={float(jnp.linalg.norm(g)):.4g}, "
              f"rays/s={o.shape[0]/dt/1e6:.1f}M")
        return

    raise SystemExit(f"unknown stage {stage}")


if __name__ == "__main__":
    main()

"""Quick raycast-only bench for kernel iteration (full harness: bench.py)."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/prim3d_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")

from primitive3d_tpu.bvh.clusters import build_mxu_clusters  # noqa: E402
from primitive3d_tpu.kernels.raycast_kernel import cast_clusters_mxu  # noqa: E402
from primitive3d_tpu.render.camera import camera_rays  # noqa: E402


def main():
    golden = np.load("/root/repo/tests/goldens/bunny_mc.npz")
    vb = (golden["v"] / 66.0).astype(np.float32)
    fb = golden["f"].astype(np.int32)
    tris = jnp.asarray(vb[fb])
    import os
    S = int(os.environ.get("BENCH_S", "128"))
    cb = jax.block_until_ready(build_mxu_clusters(tris, cluster_size=S))

    H = W = 512
    cam = camera_rays(H, W, origin=(0.5, 0.5, -1.5), look_at=(0.5, 0.5, 0.5),
                      fov_y=35.0)
    oj = jnp.asarray(cam.origins)
    dj = jnp.asarray(cam.dirs)

    depth, idx = cast_clusters_mxu(cb, oj, dj)
    hit = float((np.asarray(idx) >= 0).mean())
    md = float(np.asarray(depth)[np.asarray(idx) >= 0].mean())
    print(f"hit_frac={hit:.4f} mean_depth={md:.4f}", flush=True)

    K = 40

    def timed(k, fn):
        """Best-of-2 total seconds for k dependent iterations in one jit."""
        @jax.jit
        def looped(z):
            def body(i, acc):
                return acc + fn(acc * 1e-30 + z)
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))

        float(looped(jnp.float32(0)))
        best = 1e30
        for _ in range(2):
            t0 = time.perf_counter()
            float(looped(jnp.float32(0)))
            best = min(best, time.perf_counter() - t0)
        return best

    def slope(fn, k=K):
        # (t(2K) - t(K)) / K cancels the constant ~27 ms tunnel fetch cost
        return max((timed(2 * k, fn) - timed(k, fn)) / k, 1e-9)

    RC = int(os.environ.get("BENCH_RCHUNK", "256"))
    ST = bool(int(os.environ.get("BENCH_STREAM", "0")))
    cast = lambda z: cast_clusters_mxu(cb, oj + z, dj, rchunk=RC,
                                       stream=ST)[0][0]
    sec = slope(cast)
    print(f"{sec*1e3:.3f} ms/cast = {H*W/sec/1e6:.2f} Mrays/s", flush=True)

    if os.environ.get("BENCH_SPLIT"):
        # host-prep-only timing: work-list + r2 build without the kernel
        from primitive3d_tpu.kernels.raycast_kernel import MBLOCK, _mxu_prep

        R = oj.shape[0]
        pad = (-R) % MBLOCK
        op = jnp.concatenate([oj, jnp.zeros((pad, 3), jnp.float32)])
        dp = jnp.concatenate([dj, jnp.ones((pad, 3), jnp.float32)])

        def prep_fn(z):
            n, work, _, r2 = _mxu_prep(cb, op + z, dp, 10.0, False)
            return n[0, 0, 0].astype(jnp.float32) + r2[
                0, 0, 0, 0].astype(jnp.float32)

        psec = slope(prep_fn)
        print(f"prep-only: {psec*1e3:.3f} ms ({100*psec/sec:.1f}% of cast)",
              flush=True)


if __name__ == "__main__":
    main()

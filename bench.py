"""Benchmark harness: one JSON line on stdout, detail on stderr.

Primary metric: bunny ray casting throughput (BASELINE.md config 4 —
512x512 rays -> depth/normal/id buffers), vs the 100M rays/s/chip north-star
target. Secondary metrics (stderr): marching-cubes voxel throughput at 66^3
(bunny) and 256^3 (analytic sphere), and marching-tetrahedra throughput.

Runs on whatever device jax selects (the real TPU under the driver).
"""
import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/prim3d_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def time_fn(fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def main():
    import primitive3d_tpu as p3d
    from primitive3d_tpu.raycast import create_raycaster

    log(f"device: {jax.devices()[0]}")

    # --- marching cubes: bunny 66^3 -----------------------------------------
    grid = np.load("/root/reference/examples/data/bunny.npy")
    v, f = p3d.marching_cubes(grid, 0.0)
    g66 = jnp.asarray(grid)
    nvox66 = grid.size

    def mc66(g):
        return p3d.marching_cubes_padded(
            g, 0.0, vert_capacity=16384, face_capacity=32768
        )

    sec = time_fn(mc66, g66)
    log(f"MC 66^3 bunny: {sec*1e3:.2f} ms = {nvox66/sec/1e6:.1f} Mvox/s")

    # --- marching cubes: 256^3 sphere ---------------------------------------
    n = 256
    x, y, z = np.mgrid[:n, :n, :n].astype(np.float32)
    sph = -((x - n / 2) ** 2 + (y - n / 2) ** 2 + (z - n / 2) ** 2 - (n / 4) ** 2)
    g256 = jnp.asarray(sph)

    def mc256(g):
        return p3d.marching_cubes_padded(
            g, 0.0, vert_capacity=1 << 20, face_capacity=1 << 21
        )

    try:
        sec256 = time_fn(mc256, g256, iters=3, warmup=1)
        log(f"MC 256^3 sphere: {sec256*1e3:.2f} ms = {n**3/sec256/1e6:.1f} Mvox/s")
    except Exception as e:  # noqa: BLE001
        log(f"MC 256^3 failed: {e}")

    # --- marching tetrahedra -------------------------------------------------
    D = "/root/reference/examples/data/tetrahedra"
    pts, sdfs, tets = (
        np.load(f"{D}/points.npy"),
        np.load(f"{D}/sdfs.npy"),
        np.load(f"{D}/tetrahedras.npy"),
    )

    def mt(p, t, s):
        return p3d.marching_tetrahedra_padded(
            p, t, s, vert_capacity=8192, face_capacity=16384
        )

    jp, jt, js = jnp.asarray(pts), jnp.asarray(tets, jnp.int32), jnp.asarray(sdfs)
    sec = time_fn(mt, jp, jt, js)
    log(f"MT 12045 tets: {sec*1e3:.2f} ms = {tets.shape[0]/sec/1e6:.2f} Mtet/s")

    # --- ray casting: bunny 512x512 (primary metric) ------------------------
    # Tile-blocked camera rays (coherent 1024-ray kernel blocks) + amortized
    # loop-in-jit timing: on this backend only a host fetch truly
    # synchronizes, and each sync round-trip costs ~25-30 ms.
    from primitive3d_tpu.render.camera import camera_rays
    from primitive3d_tpu.bvh.clusters import build_clusters
    from primitive3d_tpu.kernels.raycast_kernel import cast_clusters

    vb = np.asarray(v) / 66.0
    fb = np.asarray(f)
    H = W = 512
    cam = camera_rays(H, W, origin=(0.5, 0.5, -1.5), look_at=(0.5, 0.5, 0.5),
                      fov_y=35.0)
    oj = jnp.asarray(cam.origins)
    dj = jnp.asarray(cam.dirs)

    def amortized(fn, *args, K=10):
        @jax.jit
        def looped(*args):
            def body(i, acc):
                out = fn(args[0] + acc * 1e-30, *args[1:])
                return acc + out
            return jax.lax.fori_loop(0, K, body, jnp.float32(0))
        float(looped(*args))  # compile + warm
        t0 = time.perf_counter()
        float(looped(*args))
        return (time.perf_counter() - t0) / K

    best = None
    tris = jnp.asarray(vb[fb])
    cb = jax.block_until_ready(build_clusters(tris))
    hit_frac = float(
        (np.asarray(cast_clusters(cb, oj, dj)[1]) >= 0).mean()
    )
    log(f"pallas hit fraction: {hit_frac:.3f}")
    sec = amortized(lambda o, d: cast_clusters(cb, o, d)[0][0], oj, dj)
    rps = H * W / sec
    log(f"raycast[pallas] bunny {H}x{W}: {sec*1e3:.2f} ms = {rps/1e6:.2f} Mrays/s")
    best = ("pallas", rps)

    try:
        rc = create_raycaster(vb, fb, backend="mxu")
        sec = amortized(lambda o, d: rc.cast(o, d).depth[0], oj, dj, K=3)
        rps = H * W / sec
        log(f"raycast[mxu] bunny {H}x{W}: {sec*1e3:.2f} ms = {rps/1e6:.2f} Mrays/s")
        if rps > best[1]:
            best = ("mxu", rps)
    except Exception as e:  # noqa: BLE001
        log(f"raycast[mxu] failed: {e}")

    backend, rays_per_s = best
    log(f"primary: {backend} {rays_per_s/1e6:.2f} Mrays/s")
    print(
        json.dumps(
            {
                "metric": f"bunny_512x512_rays_per_s[{backend}]",
                "value": round(rays_per_s),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_s / 1e8, 4),
            }
        )
    )


if __name__ == "__main__":
    main()

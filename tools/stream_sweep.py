"""Stream-tier parameter sweep at large triangle counts.

Round-3 verdict weak item #4: stream-tier throughput decays steeply with
mesh size (87.5 -> 44.6 -> 17.7 Mrays/s at 106k/425k/1.7M tris) because
per-entry fixed costs (DMA setup, SMEM scans, chunk conds) dominate once
clusters are small relative to the ray-chunk cone. This sweeps the two
untried levers — cluster_size (fewer, fatter entries; more MXU work per
DMA) and rchunk (finer convergence masks) — on the subdivided bunny.

Usage: python tools/stream_sweep.py [subdiv_level=3] [out.json]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/prim3d_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from primitive3d_tpu.bvh.clusters import build_mxu_clusters
from primitive3d_tpu.kernels.raycast_kernel import cast_clusters_mxu
from primitive3d_tpu.render.camera import camera_rays


def log(*a):
    print(f"[{time.perf_counter():8.1f}s]", *a, flush=True)


def subdivide(t):
    a, b, c = t[:, 0], t[:, 1], t[:, 2]
    ab, bc, ca = (a + b) / 2, (b + c) / 2, (c + a) / 2
    return np.stack([
        np.stack([a, ab, ca], 1), np.stack([ab, b, bc], 1),
        np.stack([ca, bc, c], 1), np.stack([ab, bc, ca], 1),
    ], 1).reshape(-1, 3, 3)


def timed(k, fn, *ops):
    @jax.jit
    def looped(z, *ops):
        def body(i, acc):
            return acc + fn(acc * 1e-30 + z, *ops)
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    float(looped(jnp.float32(0), *ops))
    best = 1e30
    for _ in range(2):
        t0 = time.perf_counter()
        float(looped(jnp.float32(0), *ops))
        best = min(best, time.perf_counter() - t0)
    return best


def slope(fn, k, *ops):
    return max((timed(2 * k, fn, *ops) - timed(k, fn, *ops)) / k, 1e-9)


def main():
    level = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    out = sys.argv[2] if len(sys.argv) > 2 else None
    print("device:", jax.devices()[0], flush=True)

    golden = np.load("tests/goldens/bunny_mc.npz")
    soup = (golden["v"] / 66.0).astype(np.float32)[golden["f"].astype(np.int32)]
    for _ in range(level):
        soup = subdivide(soup)
    T = soup.shape[0]
    log(f"{T} triangles (bunny x{4**level})")
    tris = jnp.asarray(soup)

    H = W = 512
    cam = camera_rays(H, W, origin=(0.5, 0.5, -1.5), look_at=(0.5, 0.5, 0.5),
                      fov_y=35.0)
    oj, dj = jnp.asarray(cam.origins), jnp.asarray(cam.dirs)

    results = []
    for S in (128, 256, 512):
        if T / S > 32767:
            log(f"S={S}: too many clusters, skip")
            continue
        cb = jax.block_until_ready(build_mxu_clusters(tris, cluster_size=S))
        log(f"S={S}: {cb.num_clusters} clusters, w2 "
            f"{cb.w2.size * 2 / 1e6:.0f} MB")
        for RC in (256, 512):
            try:
                t0 = time.perf_counter()
                d, i = cast_clusters_mxu(cb, oj, dj, stream=True, rchunk=RC)
                hf = float((np.asarray(i) >= 0).mean())
                log(f"S={S} RC={RC}: compile+run {time.perf_counter()-t0:.0f}s"
                    f" hit={hf:.3f}")
                sec = slope(
                    lambda z, cb_, o_, d_: cast_clusters_mxu(
                        cb_, o_ + z, d_, stream=True, rchunk=RC)[0][0],
                    8, cb, oj, dj)
                mrps = H * W / sec / 1e6
                log(f"S={S} RC={RC}: {sec*1e3:.2f} ms = {mrps:.1f} Mrays/s")
                results.append({"S": S, "rchunk": RC, "ms": round(sec*1e3, 2),
                                "mrays_s": round(mrps, 1), "hit": hf})
            except Exception as e:  # noqa: BLE001
                log(f"S={S} RC={RC} failed: {type(e).__name__}: {e}")
    if out:
        with open(out, "w") as fh:
            json.dump({"tris": T, "results": results}, fh, indent=1)
        log("wrote", out)


if __name__ == "__main__":
    main()

"""Split stream-tier cost: host prep (cull+sort) vs kernel, + entry stats.

Round-5 verdict item #2 groundwork: before adding a second cull level,
establish where bunny-x64's 13 ms actually goes. Times (a) _mxu_prep alone
(the interval cull + front-to-back sort, pure XLA), (b) the full streaming
cast, and reports per-block entry-count statistics (the kernel's per-entry
fixed costs + DMA volume scale with these).

Usage: python tools/stream_split.py [subdiv_level=3]  (chip; serialize)
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

from primitive3d_tpu.bvh.clusters import build_mxu_clusters
from primitive3d_tpu.kernels.raycast_kernel import (MBLOCK, cast_clusters_mxu,
                                                    _mxu_prep)
from primitive3d_tpu.render.camera import camera_rays
from tools.stream_sweep import subdivide


def log(*a):
    print(f"[{time.perf_counter():8.1f}s]", *a, flush=True)


def slope_time(fn, k):
    def run(n):
        best = 1e30
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(n):
                out = fn()
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        return best

    run(1)
    return max((run(2 * k) - run(k)) / k, 1e-9)


def main():
    level = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    import primitive3d_tpu as p3d

    grid = np.load(os.path.join(os.path.dirname(__file__), "..", "examples",
                                "data", "bunny.npy"))
    v, f = p3d.marching_cubes(grid, 0.0, scale=1.0)
    tris = np.asarray(v)[np.asarray(f)]
    for _ in range(level):
        tris = subdivide(tris)
    T = tris.shape[0]
    log(f"tris: {T}")

    S = 256 if T > 500_000 else 128
    bvh = build_mxu_clusters(jnp.asarray(tris), cluster_size=S)
    C = bvh.num_clusters
    log(f"clusters: {C} (S={S}), w2 MB: {bvh.w2.nbytes/1e6:.1f}")

    H = W = 512
    cam = camera_rays(H, W, origin=(0.5, 0.5, -1.5),
                      look_at=(0.5, 0.5, 0.5), fov_y=35.0)
    o = jnp.asarray(cam.origins)
    d = jnp.asarray(cam.dirs)
    R = o.shape[0]
    max_dist = 10.0
    rchunk = 256
    nch = MBLOCK // rchunk

    # --- entry statistics ---------------------------------------------------
    prep = jax.jit(
        lambda oo, dd: _mxu_prep(bvh, oo, dd, max_dist, True, rchunk, nch))
    n, entries, bounds, r2 = prep(o, d)
    n_np = np.asarray(n)[:, 0, 0]
    B = n_np.shape[0]
    ent_np = np.asarray(entries)[:, 0]
    masks = []
    for b in range(B):
        w = ent_np[b, : n_np[b]]
        masks.append(np.unpackbits(
            (w & 0xFFFF).astype(np.uint16).view(np.uint8)).sum())
    log(f"blocks: {B}, entries/block min/avg/max: "
        f"{n_np.min()}/{n_np.mean():.0f}/{n_np.max()}")
    log(f"chunk-visits/block avg: {np.mean(masks):.0f} "
        f"(matmul units of work)")
    w2_kb = bvh.w2.nbytes / C / 1024
    fin_kb = bvh.fin.nbytes / C / 1024 if bvh.fin is not None else 0
    log(f"DMA per entry: w2 {w2_kb:.1f} KB + fin {fin_kb:.1f} KB; "
        f"total {(n_np.sum() * (w2_kb + fin_kb)) / 1024:.1f} MB/cast")

    # --- timings ------------------------------------------------------------
    def prep_only():
        # consume EVERYTHING: a partial fetch lets XLA dead-code the sort
        # and the r2 build (the r1 bench trap)
        n2, e2, b2, r22 = prep(o, d)
        return (jnp.sum(n2) + jnp.sum(e2) + jnp.sum(b2)
                + jnp.sum(r22.astype(jnp.float32)))

    sec = slope_time(prep_only, 5)
    log(f"prep (cull+sort+r2): {sec*1e3:.2f} ms")

    # bvh must be a jit OPERAND: closing over the 650 MB w2 embeds it in
    # the HLO and blows the tunnel's remote-compile size limit (HTTP 413)
    @jax.jit
    def full(bb, oo, dd):
        dep, sidx, fin = cast_clusters_mxu(
            bb, oo, dd, max_dist=max_dist, stream=True, with_fin=True)
        return jnp.sum(dep) + jnp.sum(sidx) + jnp.sum(fin)

    sec_f = slope_time(lambda: full(bvh, o, d), 5)
    log(f"full stream cast (with_fin): {sec_f*1e3:.2f} ms = "
        f"{R/sec_f/1e6:.1f} Mrays/s")
    log(f"kernel-ish (full - prep): {(sec_f-sec)*1e3:.2f} ms")

    @jax.jit
    def full_nofin(bb, oo, dd):
        dep, sidx = cast_clusters_mxu(
            bb, oo, dd, max_dist=max_dist, stream=True, with_fin=False)
        return jnp.sum(dep) + jnp.sum(sidx)

    sec_nf = slope_time(lambda: full_nofin(bvh, o, d), 5)
    log(f"full stream cast (no fin): {sec_nf*1e3:.2f} ms = "
        f"{R/sec_nf/1e6:.1f} Mrays/s")


if __name__ == "__main__":
    main()

"""Probe flagship-scale pieces on the real chip, one step at a time.

BASELINE.md config 5: 1080p rays, 256^3 grid, gradient to the grid.

Usage: python tools/flagship_probe.py <stage> [out.json]
  counts  - exact MC counts/unit budgets for the 256^3 sphere SDF
  cast    - streamed MXU cast of 1080p rays vs the extracted mesh
  step    - full differentiable training step (MC + cast + grad);
            writes the FLAGSHIP artifact when an out.json path is given
  split   - per-sub-stage timing (MC / bvh build / prep / kernel /
            forward / backward) + kernel visit statistics
  sharded - the sharded composition (parallel/pipeline.py) on the local
            device mesh (x1 on this tunnel: fixed-overhead measurement)
  all     - counts + cast + step
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

N_GRID = 256
# capacities for the 256^3 sphere (196,128 verts / 392,252 faces measured by
# the counts stage) with growth headroom, shared by every stage so compiled
# programs are reused
VC, FC = 262_144, 425_984  # FC: multiple of 2048 (cluster-pads evenly)


def log(*a):
    print(f"[{time.perf_counter():8.1f}s]", *a, flush=True)


def slope_time(fn, k):
    """Seconds/call via the two-length slope (t(2k) - t(k)) / k.

    ``fn()`` dispatches async device work and returns an array; a tiny fetch
    of the last result synchronizes. The host fetch through the TPU tunnel
    costs a constant ~27 ms regardless of the enqueued work, so t(k)/k alone
    would overstate per-call time by floor/k; the slope cancels it.
    """

    def timed(n):
        best = 1e30
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(n):
                out = fn()
            # fetch one element to sync (0-dim results fetch whole)
            np.asarray(out.ravel()[:1] if getattr(out, "ndim", 0) else out)
            best = min(best, time.perf_counter() - t0)
        return best

    fn()  # warm
    return max((timed(2 * k) - timed(k)) / k, 1e-9)


def sphere_density(n=N_GRID, r=0.8):
    ax = jnp.linspace(-1.0, 1.0, n)
    x, y, z = jnp.meshgrid(ax, ax, ax, indexing="ij")
    return r - jnp.sqrt(x * x + y * y + z * z)


def round4k(n):
    """Round a measured budget up to a 4096 multiple (+ slack): much tighter
    than pow2 rounding — the compaction sorts scale with the budget."""
    return -(-int(n * 1.05) // 4096) * 4096


def tight_units(d):
    """Measured unit/active budgets (rounded up) for the flagship grid."""
    from primitive3d_tpu.ops.marching_cubes import _counts_impl

    nv, nf, vu, cu, na = (int(q) for q in _counts_impl(d, jnp.float32(0)))
    return nv, nf, round4k(vu), round4k(cu), round4k(na)


def extract(d, vu, cu, na=0):
    from primitive3d_tpu.ops.marching_cubes import marching_cubes_padded

    res = marching_cubes_padded(
        d, 0.0, vert_capacity=VC, face_capacity=FC,
        lower=(-1, -1, -1), upper=(1, 1, 1),
        vert_units=vu, cube_units=cu, active_capacity=na,
    )
    assert not bool(res.overflowed), "flagship capacities overflowed"
    return res


def stage_counts(d):
    nv, nf, vu, cu, na = tight_units(d)
    print(f"256^3 sphere: {nv} verts, {nf} faces, "
          f"vert_units {vu}, cube_units {cu}")
    return {"verts": nv, "faces": nf, "vert_units": vu, "cube_units": cu}


def stage_cast(d):
    from primitive3d_tpu.bvh.clusters import build_mxu_clusters
    from primitive3d_tpu.kernels.raycast_kernel import cast_clusters_mxu
    from primitive3d_tpu.render.camera import camera_rays

    S = int(os.environ.get("FLAGSHIP_S", "128"))
    RC = int(os.environ.get("FLAGSHIP_RCHUNK", "256"))
    nv, nf, vu, cu, na = tight_units(d)
    res = extract(d, vu, cu, na)
    tris = jax.lax.stop_gradient(res.vertices[res.faces])
    log("faces:", nf, "capacity:", FC)
    v = np.asarray(res.vertices[: nv])
    log("mesh bbox:", v.min(0), v.max(0))
    bvh = build_mxu_clusters(tris, cluster_size=S)
    np.asarray(bvh.w2[0, 0, :1])
    log("clusters:", bvh.num_clusters, "w2 MB:", bvh.w2.size * 2 / 1e6)
    cam = camera_rays(1088, 1920, (0.0, 0.0, 2.5), (0.0, 0.0, 0.0))
    o, dirs = jnp.asarray(cam.origins), jnp.asarray(cam.dirs)
    R = o.shape[0]
    log("rays:", R)
    t0 = time.perf_counter()
    depth, idx = cast_clusters_mxu(bvh, o, dirs, max_dist=10.0, stream=True,
                                   rchunk=RC)
    np.asarray(depth[:8])
    log("compile+run1:", time.perf_counter() - t0, "s")
    dt = slope_time(
        lambda: cast_clusters_mxu(bvh, o, dirs, max_dist=10.0,
                                  stream=True, rchunk=RC)[0], 5)
    hits = int(jnp.sum(idx >= 0))
    print(f"cast 1080p: {dt*1e3:.2f} ms = {R/dt/1e6:.1f} Mrays/s, "
          f"hit fraction {hits/R:.3f}")
    return {"cast_ms": round(dt * 1e3, 2), "rays_per_s": round(R / dt),
            "hit_fraction": round(hits / R, 4)}


def stage_step(d):
    from primitive3d_tpu.pipeline import sdf_fitting_loss
    from primitive3d_tpu.render.camera import camera_rays

    nv, nf, vu, cu, na = tight_units(d)
    cam = camera_rays(1088, 1920, (0.0, 0.0, 2.5), (0.0, 0.0, 0.0))
    o, dirs = jnp.asarray(cam.origins), jnp.asarray(cam.dirs)
    R = o.shape[0]
    target = jnp.full((R,), 1.7, jnp.float32)

    lossf = jax.jit(jax.value_and_grad(
        lambda dd: sdf_fitting_loss(
            dd, o, dirs, target, thresh=0.0,
            vert_capacity=VC, face_capacity=FC,
            vert_units=vu, cube_units=cu, active_capacity=na,
            lower=(-1, -1, -1), upper=(1, 1, 1), max_dist=10.0,
            backend="pallas",
        )
    ))
    t0 = time.perf_counter()
    loss, g = lossf(d)
    np.asarray(loss)
    log("compile+run1:", time.perf_counter() - t0, "s")
    dt = slope_time(lambda: lossf(d)[0], 3)
    gn = float(jnp.linalg.norm(g))
    print(f"flagship step: {dt*1e3:.1f} ms, loss={float(loss):.4f}, "
          f"|g|={gn:.4g}, rays/s={R/dt/1e6:.1f}M")
    assert np.isfinite(gn) and gn > 0
    return {"step_ms": round(dt * 1e3, 1), "loss": float(loss),
            "grad_norm": gn, "rays_per_s": round(R / dt)}


def stage_sharded(d):
    """The round-4 sharded composition (parallel/pipeline.py) run on the
    local device mesh — on one chip this measures the sharded program's
    fixed overhead vs stage_step's plain composition (the scaling
    denominator); on a pod slice it measures real scaling."""
    import jax
    from jax.sharding import Mesh

    from primitive3d_tpu.parallel.pipeline import sharded_sdf_fitting_loss
    from primitive3d_tpu.render.camera import camera_rays

    nv, nf, vu, cu, na = tight_units(d)
    cam = camera_rays(1088, 1920, (0.0, 0.0, 2.5), (0.0, 0.0, 0.0))
    o, dirs = jnp.asarray(cam.origins), jnp.asarray(cam.dirs)
    R = o.shape[0]
    target = jnp.full((R,), 1.7, jnp.float32)
    nd = len(jax.devices())
    mesh = Mesh(np.array(jax.devices()), axis_names=("data",))

    lossf = jax.jit(jax.value_and_grad(
        lambda dd: sharded_sdf_fitting_loss(
            mesh, dd, o, dirs, target, thresh=0.0,
            vert_capacity=VC, face_capacity=FC,
            vert_units=vu // nd if nd > 1 else vu,
            cube_units=cu // nd if nd > 1 else cu,
            lower=(-1, -1, -1), upper=(1, 1, 1), max_dist=10.0,
        )
    ))
    t0 = time.perf_counter()
    loss, g = lossf(d)
    np.asarray(loss)
    log("compile+run1:", time.perf_counter() - t0, "s")
    dt = slope_time(lambda: lossf(d)[0], 3)
    gn = float(jnp.linalg.norm(g))
    print(f"sharded step x{nd}: {dt*1e3:.1f} ms, loss={float(loss):.4f}, "
          f"|g|={gn:.4g}, rays/s={R/dt/1e6:.1f}M")
    assert np.isfinite(gn) and gn > 0
    return {"devices": nd, "step_ms": round(dt * 1e3, 1),
            "loss": float(loss), "grad_norm": gn,
            "rays_per_s": round(R / dt)}


def stage_split(d):
    """Per-sub-stage timing + visit stats for the flagship cast and step."""
    from primitive3d_tpu.bvh.clusters import build_mxu_clusters
    from primitive3d_tpu.kernels.raycast_kernel import (
        MBLOCK, NCH, _mxu_prep, cast_clusters_mxu)
    from primitive3d_tpu.pipeline import render_depth, sdf_fitting_loss
    from primitive3d_tpu.render.camera import camera_rays

    nv, nf, vu, cu, na = tight_units(d)
    cam = camera_rays(1088, 1920, (0.0, 0.0, 2.5), (0.0, 0.0, 0.0))
    o, dirs = jnp.asarray(cam.origins), jnp.asarray(cam.dirs)
    R = o.shape[0]

    # -- MC extract alone --------------------------------------------------
    @jax.jit
    def ext(dd):
        res = extract_nocheck(dd, vu, cu, na)
        return res.vertices, res.faces, res.overflowed

    v, f, ov = ext(d)
    assert not bool(ov)
    t_mc = slope_time(lambda: ext(d)[0], 5)
    log(f"MC extract: {t_mc*1e3:.1f} ms")

    # -- de-index + cluster build alone ------------------------------------
    @jax.jit
    def bld(v, f):
        return build_mxu_clusters(v[f])

    bvh = bld(v, f)
    np.asarray(bvh.w2[0, 0, :1])
    t_bvh = slope_time(lambda: bld(v, f).w2, 5)
    log(f"de-index + mxu cluster build: {t_bvh*1e3:.1f} ms "
        f"({bvh.num_clusters} clusters)")

    # -- prep alone + visit stats ------------------------------------------
    pad = (-R) % MBLOCK
    op = jnp.concatenate([o, jnp.zeros((pad, 3), jnp.float32)])
    dp = jnp.concatenate([dirs, jnp.ones((pad, 3), jnp.float32)])

    @jax.jit
    def prep_fn(z):
        n, work, _, r2 = _mxu_prep(bvh, op + z, dp, 10.0, True)
        return n[:, 0, 0].astype(jnp.float32).sum() + r2[
            0, 0, 0, 0].astype(jnp.float32)

    t_prep = slope_time(lambda: prep_fn(jnp.float32(0)), 5)
    n, work, _, _ = _mxu_prep(bvh, op, dp, 10.0, True)
    words = np.asarray(work)[:, 0]
    # stream work word is (c << 16) | 16-bit chunk mask; unpack the full
    # 16 mask bits so the stat tracks rchunk < 256 (nch > 8) configurations
    masks = (words & 0xFFFF).astype(np.uint16)
    visits = int(np.unpackbits(
        masks[..., None].view(np.uint8), axis=-1).sum())
    ncl = int(np.asarray(n).sum())
    B = op.shape[0] // MBLOCK
    # one visit = one (48, 4S)x(48, RCHUNK) bf16 matmul
    flop = visits * 2 * 48 * 4 * bvh.cluster_size * 256
    log(f"prep: {t_prep*1e3:.1f} ms; {ncl} cluster entries, {visits} visits "
        f"({visits/B:.0f}/block, {visits/(B*NCH):.1f}/chunk); "
        f"matmul work {flop/1e12:.2f} TFLOP "
        f"-> {flop/197e12*1e3:.1f} ms at MXU peak")

    # -- full cast ----------------------------------------------------------
    t_cast = slope_time(
        lambda: cast_clusters_mxu(bvh, o, dirs, max_dist=10.0,
                                  stream=True)[0], 5)
    log(f"cast total: {t_cast*1e3:.1f} ms = {R/t_cast/1e6:.1f} Mrays/s "
        f"(kernel ~{(t_cast-t_prep)*1e3:.1f} ms)")

    # -- forward render vs full grad step ------------------------------------
    target = jnp.full((R,), 1.7, jnp.float32)
    kw = dict(thresh=0.0, vert_capacity=VC, face_capacity=FC,
              vert_units=vu, cube_units=cu, active_capacity=na,
              lower=(-1, -1, -1),
              upper=(1, 1, 1), max_dist=10.0, backend="pallas")

    fwd = jax.jit(lambda dd: render_depth(dd, o, dirs, **kw).depth)
    np.asarray(fwd(d)[:1])
    t_fwd = slope_time(lambda: fwd(d), 3)
    log(f"forward render_depth: {t_fwd*1e3:.1f} ms")

    lossf = jax.jit(jax.value_and_grad(
        lambda dd: sdf_fitting_loss(dd, o, dirs, target, **kw)))
    np.asarray(lossf(d)[0])
    t_step = slope_time(lambda: lossf(d)[0], 3)
    log(f"grad step: {t_step*1e3:.1f} ms (backward ~{(t_step-t_fwd)*1e3:.1f} ms)")

    # -- backward decomposition ---------------------------------------------
    # grad wrt the triangle soup isolates the plane epilogue + its
    # gather-transpose scatter; grad wrt vertices adds the soup
    # gather-transpose; grad wrt density adds the MC backward.
    from primitive3d_tpu.kernels.raycast_kernel import cast_clusters_diff

    res = extract_nocheck(d, vu, cu, na)
    tris0 = jax.lax.stop_gradient(res.vertices[res.faces])
    target_ = target

    @jax.jit
    @jax.value_and_grad
    def loss_tris(ts):
        dep, _ = cast_clusters_diff(ts, o, dirs, max_dist=10.0)
        return jnp.mean((dep - target_) ** 2)

    np.asarray(loss_tris(tris0)[0])
    t_lt = slope_time(lambda: loss_tris(tris0)[0], 3)
    log(f"cast+grad wrt soup: {t_lt*1e3:.1f} ms "
        f"(epilogue fwd+bwd ~{(t_lt-t_cast)*1e3:.1f} ms)")

    v0 = jax.lax.stop_gradient(res.vertices)
    f0 = res.faces

    @jax.jit
    @jax.value_and_grad
    def loss_verts(vv):
        dep, _ = cast_clusters_diff(vv[f0], o, dirs, max_dist=10.0)
        return jnp.mean((dep - target_) ** 2)

    np.asarray(loss_verts(v0)[0])
    t_lv = slope_time(lambda: loss_verts(v0)[0], 3)
    log(f"cast+grad wrt vertices: {t_lv*1e3:.1f} ms "
        f"(soup gather fwd+bwd ~{(t_lv-t_lt)*1e3:.1f} ms; "
        f"MC fwd+bwd ~{(t_step-t_lv)*1e3:.1f} ms)")
    return {
        "mc_ms": round(t_mc * 1e3, 1), "bvh_ms": round(t_bvh * 1e3, 1),
        "prep_ms": round(t_prep * 1e3, 1), "cast_ms": round(t_cast * 1e3, 1),
        "fwd_ms": round(t_fwd * 1e3, 1), "step_ms": round(t_step * 1e3, 1),
        "visits": visits, "entries": ncl,
    }


def extract_nocheck(d, vu, cu, na=0):
    from primitive3d_tpu.ops.marching_cubes import marching_cubes_padded

    return marching_cubes_padded(
        d, 0.0, vert_capacity=VC, face_capacity=FC,
        lower=(-1, -1, -1), upper=(1, 1, 1),
        vert_units=vu, cube_units=cu, active_capacity=na,
    )


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "counts"
    out = sys.argv[2] if len(sys.argv) > 2 else None
    print("device:", jax.devices()[0])
    d = sphere_density()

    report = {
        "config": "BASELINE.md config 5: 1080p rays, 256^3 grid, grad",
        "grid": N_GRID, "rays": 1088 * 1920,
        "vert_capacity": VC, "face_capacity": FC,
        "device": str(jax.devices()[0]),
    }
    if stage in ("counts", "all"):
        report["counts"] = stage_counts(d)
    if stage in ("cast", "all"):
        report["cast"] = stage_cast(d)
    if stage in ("step", "all"):
        report["step"] = stage_step(d)
    if stage == "split":
        report["split"] = stage_split(d)
    if stage == "sharded":
        report["sharded"] = stage_sharded(d)
    if stage not in ("counts", "cast", "step", "split", "sharded", "all"):
        raise SystemExit(f"unknown stage {stage}")
    if out:
        with open(out, "w") as fh:
            json.dump(report, fh, indent=1)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()

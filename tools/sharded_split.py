"""Measured x1 stage split of the SHARDED flagship composition.

Round-5 verdict item #3: the round-4 serial-fraction accounting used
single-chip stage times as proxies for the sharded program's stages, which
understated the sharded MC body's ~3x x1 overhead. This probe times the
actual sharded composition's stages on a 1-device mesh (the real chip) so
SCALING_r5's accounting divides measured sharded work, not proxies:

  soup_body — per-shard soup-direct MC (1-row halo, no vertex numbering)
  gather    — + soup all-gather
  loss      — full sharded forward loss
  grad      — full value_and_grad (the training step)

Usage: python tools/sharded_split.py [out.json]  (chip; serialize)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/prim3d_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import functools

import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from tools.flagship_probe import (FC, VC, slope_time, sphere_density,
                                  tight_units)


def log(*a):
    print(f"[{time.perf_counter():8.1f}s]", *a, flush=True)


def main():
    from primitive3d_tpu.ops.marching_cubes import _mc_soup_impl
    from primitive3d_tpu.parallel.pipeline import sharded_sdf_fitting_loss
    from primitive3d_tpu.render.camera import camera_rays

    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    print("device:", jax.devices()[0])
    d = sphere_density()
    nv, nf, vu, cu, na = tight_units(d)
    nd = len(jax.devices())
    mesh = Mesh(np.array(jax.devices()), axis_names=("data",))
    S = nd
    X = d.shape[0]
    vcap = -(-VC // S)
    fcap = -(-FC // (S * 128)) * 128
    thr = jnp.float32(0.0)
    scale = jnp.full((3,), 2.0 / X, jnp.float32)
    lo = jnp.full((3,), -1.0, jnp.float32)

    cam = camera_rays(1088, 1920, (0.0, 0.0, 2.5), (0.0, 0.0, 0.0))
    o, dirs = jnp.asarray(cam.origins), jnp.asarray(cam.dirs)
    R = o.shape[0]
    target = jnp.full((R,), 1.7, jnp.float32)
    report = {"devices": nd, "grid": X, "rays": R}

    def smap(fn):
        return jax.jit(functools.partial(
            shard_map, mesh=mesh, in_specs=(P("data"),), out_specs=P(),
            check_vma=False)(fn))

    # --- (a) per-shard soup body alone --------------------------------------
    lo_w = jnp.full((3,), -1.0, jnp.float32)
    up_w = jnp.full((3,), 1.0, jnp.float32)
    # same per-shard active budget the pipeline derives: the global tight
    # bound is safe on every shard (concentration cannot break it)
    acap = min(fcap, -(-na // 128) * 128)

    def soup_body(slab):
        s = jax.lax.axis_index("data")
        Xs = slab.shape[0]
        perm = [(i, (i - 1) % S) for i in range(S)]
        halo = jax.lax.ppermute(slab[0:1], "data", perm)
        halo = jnp.where(s == S - 1, slab[-1:], halo)
        g = jnp.concatenate([slab, halo], axis=0)
        row_limit = jnp.clip(X - 1 - s * Xs, 0, Xs)
        sres = _mc_soup_impl(
            g, thr, lo_w, up_w, fcap, 1, acap,
            row_limit=row_limit, x_offset=s * Xs, x_total=X)
        return sres

    def body_only(slab):
        return jax.lax.psum(jnp.sum(soup_body(slab).soup), "data")

    f_a = smap(body_only)
    float(f_a(d))
    t_a = slope_time(lambda: f_a(d), 5)
    log(f"soup shard body x{nd}: {t_a*1e3:.2f} ms")
    report["mc_body_ms"] = round(t_a * 1e3, 2)

    # --- (b) + soup all-gather ----------------------------------------------
    def to_soup(slab):
        soup = jax.lax.all_gather(
            soup_body(slab).soup, "data", tiled=True)
        return jax.lax.psum(jnp.sum(soup), "data")

    f_b = smap(to_soup)
    float(f_b(d))
    t_b = slope_time(lambda: f_b(d), 5)
    log(f"+ soup all-gather x{nd}: {t_b*1e3:.2f} ms")
    report["soup_ms"] = round(t_b * 1e3, 2)

    # --- (c) full forward loss ----------------------------------------------
    kw = dict(thresh=0.0, vert_capacity=VC, face_capacity=FC,
              active_capacity=na,
              lower=(-1, -1, -1), upper=(1, 1, 1), max_dist=10.0)

    lossf = jax.jit(
        lambda dd: sharded_sdf_fitting_loss(mesh, dd, o, dirs, target, **kw))
    t0 = time.perf_counter()
    l0 = float(lossf(d))
    log("loss compile+run1:", round(time.perf_counter() - t0, 1), "s")
    t_c = slope_time(lambda: lossf(d), 3)
    log(f"sharded loss fwd x{nd}: {t_c*1e3:.2f} ms (loss={l0:.4f})")
    report["loss_fwd_ms"] = round(t_c * 1e3, 2)
    report["loss"] = l0

    # --- (d) full training step ---------------------------------------------
    gradf = jax.jit(jax.value_and_grad(
        lambda dd: sharded_sdf_fitting_loss(mesh, dd, o, dirs, target, **kw)))
    t0 = time.perf_counter()
    l1, g = gradf(d)
    float(l1)
    log("grad compile+run1:", round(time.perf_counter() - t0, 1), "s")
    t_d = slope_time(lambda: gradf(d)[0], 3)
    gn = float(jnp.linalg.norm(g))
    log(f"sharded step x{nd}: {t_d*1e3:.2f} ms, |g|={gn:.4g}")
    report["step_ms"] = round(t_d * 1e3, 2)
    report["grad_norm"] = gn
    report["bwd_ms"] = round((t_d - t_c) * 1e3, 2)

    if out_path:
        with open(out_path, "w") as fh:
            json.dump(report, fh, indent=1)
        log("wrote", out_path)


if __name__ == "__main__":
    main()

"""Scaling-efficiency report: rays/s and voxels/s at 1..N devices.

BASELINE.md requires throughput reported at 1 chip / 1 host / N hosts with
>= 85% efficiency on a 2-host slice. This harness runs the sharded ray caster
and sharded marching cubes over whatever devices are available (a real pod
slice, or the virtual CPU mesh for a logic check) and writes a JSON artifact:

    python tools/scaling_report.py [--out SCALING.json]     # local devices
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/scaling_report.py --out SCALING_r3.json  # virtual mesh

Efficiency numbers on the virtual CPU mesh only validate the machinery (all
virtual devices share one CPU, so per-device rates FALL as n grows and
"efficiency" reflects scheduler overhead, not ICI scaling); real numbers
require real chips — the artifact records which case it measured.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# honor JAX_PLATFORMS even though sitecustomize may have pre-imported jax
if os.environ.get("JAX_PLATFORMS") and "axon" not in os.environ["JAX_PLATFORMS"]:
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir", "/tmp/prim3d_jax_cache_tpu")

import jax.numpy as jnp
import numpy as np


def amortized(fn, K=5):
    @jax.jit
    def looped(z):
        def body(i, acc):
            return acc + fn(acc * 1e-30 + z)
        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    float(looped(jnp.float32(0)))
    t0 = time.perf_counter()
    float(looped(jnp.float32(0)))
    return (time.perf_counter() - t0) / K


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None, help="write JSON artifact here")
    args = ap.parse_args()

    from primitive3d_tpu.parallel.marching_cubes import sharded_marching_cubes
    from primitive3d_tpu.parallel.mesh import make_mesh
    from primitive3d_tpu.mxu_cast import cast_mxu, triangle_matrix
    from jax.sharding import NamedSharding, PartitionSpec as P
    from tests.oracles.raycast_numpy import icosphere

    devs = jax.devices()
    on_tpu = jax.default_backend() in ("tpu", "axon")
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(devs)]
    print(f"devices: {len(devs)} x {devs[0].device_kind}")
    report = {
        "platform": jax.default_backend(),
        "device_kind": str(devs[0].device_kind),
        "n_devices": len(devs),
        "virtual_cpu_mesh": not on_tpu,
        "rays": [],
        "voxels": [],
    }

    # --- rays: data-parallel MXU cast over an icosphere ---------------------
    v, f = icosphere(3)
    w = triangle_matrix(jnp.asarray(np.asarray(v, np.float32)[np.asarray(f)]))
    R = 1 << 15
    rng = np.random.default_rng(0)
    o = (rng.standard_normal((R, 3)) * 2).astype(np.float32)
    d = rng.standard_normal((R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    oj, dj = jnp.asarray(o), jnp.asarray(d)

    base_rate = None
    for n in sizes:
        mesh = make_mesh(n, axis_name="data")
        sh = NamedSharding(mesh, P("data"))
        ojs = jax.device_put(oj, sh)
        djs = jax.device_put(dj, sh)

        def cast_s(z, ojs=ojs, djs=djs):
            t, i = cast_mxu(w, ojs + z, djs, jnp.float32(10.0), 512)
            # consume BOTH outputs: a single-element sync lets XLA dead-code
            # whole sections (the r1/r2 MT-bench lesson)
            return jnp.sum(t) + jnp.sum(i).astype(jnp.float32)

        sec = amortized(cast_s)
        rate = R / sec
        eff = 100.0 * rate / (base_rate * n) if base_rate else 100.0
        if base_rate is None:
            base_rate = rate
        print(f"rays  n={n}: {rate/1e6:8.2f} Mrays/s  efficiency {eff:5.1f}%")
        report["rays"].append(
            {"devices": n, "rays_per_s": round(rate), "efficiency_pct": round(eff, 1)}
        )

    # --- voxels: sharded MC -------------------------------------------------
    N = 64
    x, y, z = np.mgrid[:N, :N, :N].astype(np.float32)
    grid = jnp.asarray(-((x - N / 2) ** 2 + (y - N / 2) ** 2 + (z - N / 2) ** 2
                         - (N / 4) ** 2))
    base_rate = None
    for n in sizes:
        if N % n:
            continue
        mesh = make_mesh(n, axis_name="x")

        def mc_s(zz, mesh=mesh):
            r = sharded_marching_cubes(
                mesh, grid + zz, 0.0,
                vert_cap_per_shard=1 << 14, face_cap_per_shard=1 << 15,
            )
            return (jnp.sum(r.vertices)
                    + jnp.sum(r.faces).astype(jnp.float32))

        sec = amortized(mc_s, K=3)
        rate = N**3 / sec
        eff = 100.0 * rate / (base_rate * n) if base_rate else 100.0
        if base_rate is None:
            base_rate = rate
        print(f"voxels n={n}: {rate/1e6:8.2f} Mvox/s  efficiency {eff:5.1f}%")
        report["voxels"].append(
            {"devices": n, "vox_per_s": round(rate), "efficiency_pct": round(eff, 1)}
        )

    # --- communication analysis (exact, from compiled HLO) ------------------
    # Wall-clock efficiency on the virtual CPU mesh is meaningless (all
    # virtual devices share one CPU), but the COLLECTIVES the sharded
    # programs execute are exactly those in the compiled HLO — count them
    # and their payload bytes. Rays are pure DP (expected: zero collectives
    # in the cast itself); sharded MC exchanges one halo row per neighbor
    # and all-gathers per-row counts (payload ~KB against ~MB-scale
    # per-shard compute) — the basis for the >= 85%-efficiency expectation
    # on a real ICI-connected slice.
    def comm_stats(compiled_text):
        import re

        DT = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1, "s8": 1,
              "u8": 1, "f16": 2, "s64": 8, "u64": 8, "f64": 8}
        stats = {}
        for op in ("all-gather", "collective-permute", "all-reduce",
                   "reduce-scatter", "all-to-all"):
            n_ops = 0
            n_bytes = 0
            for m in re.finditer(
                rf"= ([a-z0-9]+)\[([0-9,]*)\][^=]*{op}\(", compiled_text
            ):
                n_ops += 1
                dt, dims = m.group(1), m.group(2)
                sz = DT.get(dt, 4)
                for q in dims.split(","):
                    if q:
                        sz *= int(q)
                n_bytes += sz
            if n_ops:
                stats[op] = {"ops": n_ops, "payload_bytes": n_bytes}
        return stats

    try:
        n = sizes[-1]
        mesh = make_mesh(n, axis_name="data")
        sh = NamedSharding(mesh, P("data"))
        ojs = jax.device_put(oj, sh)
        djs = jax.device_put(dj, sh)
        txt = (
            jax.jit(lambda a, b: cast_mxu(w, a, b, jnp.float32(10.0), 512))
            .lower(ojs, djs).compile().as_text()
        )
        rays_comm = comm_stats(txt)

        meshx = make_mesh(n, axis_name="x")
        txt2 = (
            jax.jit(lambda g: sharded_marching_cubes(
                meshx, g, 0.0, vert_cap_per_shard=1 << 14,
                face_cap_per_shard=1 << 15).vertices)
            .lower(grid).compile().as_text()
        )
        mc_comm = comm_stats(txt2)
        report["collectives"] = {
            "devices": n,
            "rays_cast": rays_comm or "none (pure data parallel)",
            "sharded_mc": mc_comm,
            "note": "payload bytes per step from compiled HLO; the rays "
                    "path moves nothing between devices and sharded MC "
                    "moves ~KBs of halo rows / row counts against MB-scale "
                    "per-shard compute — the expected-efficiency basis for "
                    "a real ICI slice",
        }
        print("collectives (rays):", rays_comm or "none")
        print("collectives (MC):", mc_comm)
    except Exception as e:  # noqa: BLE001
        print("comm analysis failed:", e)

    # --- FULL flagship step: collectives + serial-fraction accounting -------
    # The round-4 sharded composition (parallel/pipeline.py): sharded MC
    # extraction -> all-gathered mesh -> replicated cluster build -> ray-DP
    # cast -> psum'd loss; gradient wrt the sharded grid. Compile the whole
    # value_and_grad program on the mesh and count its collectives, and
    # record the measured single-chip per-stage split (tools/flagship_probe
    # split, TPU v5e) classified replicated vs sharded.
    try:
        from primitive3d_tpu.parallel.pipeline import sharded_sdf_fitting_loss

        n = sizes[-1]
        meshd = make_mesh(n, axis_name="data")
        Ns = 64
        xs_, ys_, zs_ = np.mgrid[:Ns, :Ns, :Ns].astype(np.float32)
        gridf = jnp.asarray(-((xs_ - Ns / 2.37) ** 2 + (ys_ - Ns / 2) ** 2
                              + (zs_ - Ns / 2) ** 2 - (Ns / 4) ** 2) / Ns)
        Rf = 1 << 14
        of = jnp.asarray(np.tile([Ns / 2.0, Ns / 2.0, -2.0 * Ns],
                                 (Rf, 1)).astype(np.float32))
        gq = int(np.sqrt(Rf))
        yy, xx = np.mgrid[0:gq, 0:gq]
        df = np.stack([(xx.ravel() + 0.5) / gq - 0.5,
                       (yy.ravel() + 0.5) / gq - 0.5,
                       np.full(Rf, 2.2, np.float32)], -1).astype(np.float32)
        df = jnp.asarray(df / np.linalg.norm(df, axis=1, keepdims=True))
        tf = jnp.full((Rf,), 2.0 * Ns, jnp.float32)

        def step(g):
            return jax.value_and_grad(
                lambda gg: sharded_sdf_fitting_loss(
                    meshd, gg, of, df, tf,
                    vert_capacity=1 << 14, face_capacity=1 << 15,
                    max_dist=1e3,
                )
            )(g)

        txt3 = jax.jit(step).lower(gridf).compile().as_text()
        step_comm = comm_stats(txt3)
        report["flagship_step"] = {
            "devices": n,
            "config": f"{Ns}^3 grid, {Rf} rays, full value_and_grad "
                      "(collective structure; payloads scale with shapes)",
            "collectives": step_comm,
            "serial_fraction_accounting": {
                "note": "single-chip per-stage ms from tools/flagship_probe "
                        "split (1080p, 256^3, TPU v5e, round 4); 'sharded' "
                        "stages divide by device count in the composition, "
                        "'replicated' stages run identically on every device",
                "sharded_ms": {
                    "mc_extract": 90.0,
                    "cast_kernel_plus_prep": 22.9,
                    "fin_select_extra": 6.1,
                    "backward (plane scatter + soup scatter + MC bwd)": 47.0,
                },
                "replicated_ms": {
                    "cluster_build_w2_fin": 12.0,
                    "plane_rows_and_misc": 2.0,
                },
                "serial_fraction_pct": round(
                    100 * 14.0 / (90.0 + 22.9 + 6.1 + 47.0 + 14.0), 1),
            },
        }
        print("collectives (flagship step):", step_comm)
    except Exception as e:  # noqa: BLE001
        print("flagship step analysis failed:", e)

    if args.out:
        with open(args.out, "w") as fh:
            json.dump(report, fh, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

"""Scaling evidence: collective payloads + shard-overhead growth.

BASELINE.md asks for scaling efficiency at 1 chip / 1 host / N hosts; real
multi-chip hardware is unavailable here, so this harness produces the
evidence that IS measurable (round-5 verdict: the old virtual-mesh
throughput table was measurement noise and is gone):

  1. WEAK-SCALING OVERHEAD on the virtual CPU mesh: per-shard work held
     FIXED while the shard count grows. All virtual devices share one CPU,
     so the ideal wall time is S x the 1-shard time; the measured ratio
     above S isolates the overhead the sharding itself adds (collectives,
     halo rows, padding) — a logic-level lower bound on scaling loss.
  2. COLLECTIVE PAYLOADS from compiled HLO: the exact ops and bytes each
     sharded program moves per step — the basis for projecting ICI-slice
     efficiency.
  3. SERIAL-FRACTION ACCOUNTING from MEASURED x1 sharded stage times
     (tools/sharded_split.py artifact, real chip), not single-chip
     proxies.

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/scaling_report.py --out SCALING_r5.json \
        [--sharded-split SHARDED_SPLIT_r5.json] [--flagship FLAGSHIP_r5.json]
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
    ap.add_argument("--sharded-split", default=None,
                    help="sharded_split.py artifact (measured x1 sharded "
                         "stage times, real chip) for the accounting")
    ap.add_argument("--flagship", default=None,
                    help="flagship_probe artifact with the single-chip "
                         "step_ms to compare against")
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
        "weak_scaling_overhead": [],
    }

    # --- rays for the HLO collective analysis below -------------------------
    v, f = icosphere(3)
    w = triangle_matrix(jnp.asarray(np.asarray(v, np.float32)[np.asarray(f)]))
    R = 1 << 15
    rng = np.random.default_rng(0)
    o = (rng.standard_normal((R, 3)) * 2).astype(np.float32)
    d = rng.standard_normal((R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    oj, dj = jnp.asarray(o), jnp.asarray(d)

    # --- weak scaling: FIXED per-shard MC work, growing shard count ---------
    # On the shared-CPU virtual mesh the ideal wall time is S x the 1-shard
    # time (every virtual device's work runs on one CPU); overhead_factor =
    # measured / ideal isolates what the sharding itself adds. The r4
    # throughput table this replaces divided constant TOTAL work across
    # virtual devices and called the noise "efficiency".
    Ns = 32  # per-shard slab: (Ns, Ny, Nz)
    Ny = Nz = 64
    base = None
    for n in sizes:
        X = Ns * n
        xg, yg, zg = np.mgrid[:X, :Ny, :Nz].astype(np.float32)
        grid = jnp.asarray(
            -((xg - X / 2) ** 2 + (yg - Ny / 2) ** 2 + (zg - Nz / 2) ** 2
              - (min(X, Ny) / 3) ** 2) / X)
        mesh = make_mesh(n, axis_name="x")

        def mc_s(zz, mesh=mesh, grid=grid):
            r = sharded_marching_cubes(
                mesh, grid + zz, 0.0,
                vert_cap_per_shard=1 << 14, face_cap_per_shard=1 << 15,
            )
            return (jnp.sum(r.vertices)
                    + jnp.sum(r.faces).astype(jnp.float32))

        sec = amortized(mc_s, K=3)
        ideal = (base * n) if base else sec
        if base is None:
            base = sec
        factor = sec / ideal
        print(f"weak-scaling S={n}: {sec*1e3:8.2f} ms "
              f"(ideal {ideal*1e3:.2f}) overhead x{factor:.3f}")
        report["weak_scaling_overhead"].append(
            {"shards": n, "ms": round(sec * 1e3, 2),
             "ideal_ms": round(ideal * 1e3, 2),
             "overhead_factor": round(factor, 3)})
    report["weak_scaling_note"] = (
        "fixed (32, 64, 64) slab per shard on the shared-CPU virtual mesh; "
        "ideal = S x 1-shard time; overhead_factor-1 is the sharding's own "
        "added cost (collectives, halo, padding) at the logic level")

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
        }
        # serial-fraction accounting from MEASURED x1 sharded stage times
        # (round-5 fix: the r4 accounting used single-chip stage times as
        # proxies, understating the sharded MC body's x1 overhead)
        if args.sharded_split:
            with open(args.sharded_split) as fh:
                ss = json.load(fh)
            step_ms = ss["step_ms"]
            # stages measured on the SHARDED program at x1: the mc body,
            # the gather/remap/de-index, and the rest of the step. The
            # replicated (serial) work is the soup -> cluster-matrix build
            # + plane rows, measured as loss_fwd - (soup stage + cast);
            # everything in mc_body/soup/backward shards with devices.
            acct = {
                "note": "all times MEASURED on the x1 SHARDED composition "
                        "(tools/sharded_split.py, real chip) — not "
                        "single-chip proxies",
                "x1_sharded_stage_ms": {
                    "soup_shard_body": ss["mc_body_ms"],
                    "soup_all_gather": round(
                        ss["soup_ms"] - ss["mc_body_ms"], 2),
                    "cluster_build_cast_epilogue (replicated build)": round(
                        ss["loss_fwd_ms"] - ss["soup_ms"], 2),
                    "backward": ss["bwd_ms"],
                },
                "x1_sharded_step_ms": step_ms,
            }
            if args.flagship:
                with open(args.flagship) as fh:
                    fl = json.load(fh)
                single = (fl.get("step", {}).get("step_ms")
                          or fl.get("split", {}).get("step_ms"))
                if single:
                    acct["single_chip_step_ms"] = single
                    acct["x1_overhead_factor"] = round(step_ms / single, 3)
            report["flagship_step"]["serial_fraction_accounting"] = acct
        else:
            report["flagship_step"]["serial_fraction_accounting"] = (
                "absent — run tools/sharded_split.py on the chip and pass "
                "--sharded-split")
        print("collectives (flagship step):", step_comm)
    except Exception as e:  # noqa: BLE001
        print("flagship step analysis failed:", e)

    if args.out:
        with open(args.out, "w") as fh:
            json.dump(report, fh, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

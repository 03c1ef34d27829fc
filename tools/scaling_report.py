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
            t, _ = cast_mxu(w, ojs + z, djs, jnp.float32(10.0), 512)
            return t[0]

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
            return r.vertices[0, 0] + r.face_count[0].astype(jnp.float32)

        sec = amortized(mc_s, K=3)
        rate = N**3 / sec
        eff = 100.0 * rate / (base_rate * n) if base_rate else 100.0
        if base_rate is None:
            base_rate = rate
        print(f"voxels n={n}: {rate/1e6:8.2f} Mvox/s  efficiency {eff:5.1f}%")
        report["voxels"].append(
            {"devices": n, "vox_per_s": round(rate), "efficiency_pct": round(eff, 1)}
        )

    if args.out:
        with open(args.out, "w") as fh:
            json.dump(report, fh, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

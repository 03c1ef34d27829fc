"""Differentiable SDF fitting from depth renders (flagship demo).

No reference counterpart (the reference's CUDA MC is not differentiable);
this exercises the whole stack end-to-end: SDF grid -> padded marching cubes
-> MXU ray cast -> depth loss -> gradient back to the grid, optionally
data-parallel over all local devices, with npz checkpoint/resume.

Usage: python examples/sdf_fitting.py [--steps N] [--resume]
       python examples/sdf_fitting.py --flagship [--steps N]
           (BASELINE.md config 5 scale: 256^3 grid, 1080p rays — run on TPU)
       python examples/sdf_fitting.py --sharded [--steps N]
           (the fully sharded composition — sharded MC extraction + ray-DP
            cast via parallel/pipeline.py — over all local devices)
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from primitive3d_tpu.pipeline import sdf_fitting_loss, render_depth  # noqa: E402
from primitive3d_tpu.parallel.mesh import (  # noqa: E402
    make_mesh, replicated, sharded_along)

N = 24
VC, FC = 4096, 8192
CKPT = "sdf_fit_ckpt.npz"


def target_scene():
    """Ground-truth: a sphere SDF grid; target depths rendered from it."""
    x, y, z = np.mgrid[:N, :N, :N].astype(np.float32)
    c, r = N / 2, N / 4
    return -((x - c) ** 2 + (y - c) ** 2 + (z - c) ** 2 - r**2) / N


def rays(n_side=32):
    o = np.tile(np.array([N / 2, N / 2, -2.0 * N], np.float32), (n_side**2, 1))
    ys, xs = np.mgrid[0:n_side, 0:n_side]
    d = np.stack(
        [
            (xs.ravel() + 0.5) / n_side - 0.5,
            (ys.ravel() + 0.5) / n_side - 0.5,
            np.full(n_side**2, 2.2, np.float32),
        ],
        -1,
    ).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, d


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--flagship", action="store_true",
                    help="256^3 grid, 1080p rays (BASELINE.md config 5)")
    ap.add_argument("--sharded", action="store_true",
                    help="train through the fully sharded composition "
                         "(parallel/pipeline.py) on all local devices")
    args = ap.parse_args()

    if args.flagship:
        return flagship(args)
    if args.sharded:
        return sharded(args)

    kw = dict(vert_capacity=VC, face_capacity=FC, max_dist=100.0, chunk=256)
    o, d = rays()
    target = np.asarray(
        render_depth(jnp.asarray(target_scene()), o, d, **kw).depth
    )
    print(f"target: {np.mean(target < 100.0):.2f} hit fraction")

    # init: a larger sphere (wrong radius) to be deformed toward the target
    x, y, z = np.mgrid[:N, :N, :N].astype(np.float32)
    density0 = -((x - N / 2) ** 2 + (y - N / 2) ** 2 + (z - N / 2) ** 2
                 - (N / 2.5) ** 2) / N

    step0 = 0
    if args.resume and os.path.exists(CKPT):
        ck = np.load(CKPT)
        density0, step0 = ck["density"], int(ck["step"])
        print(f"resumed from step {step0}")

    mesh = make_mesh(axis_name="data")
    n_dev = mesh.devices.size
    print(f"data-parallel over {n_dev} device(s)")

    opt = optax.adam(3e-2)
    density = jnp.asarray(density0)
    opt_state = opt.init(density)

    @jax.jit
    def train_step(density, opt_state, o, d, target):
        loss, grad = jax.value_and_grad(
            lambda g: sdf_fitting_loss(g, o, d, target, **kw)
        )(density)
        updates, opt_state = opt.update(grad, opt_state)
        return loss, optax.apply_updates(density, updates), opt_state

    if n_dev > 1:
        ray_sh = sharded_along(mesh, "data")
        rep = replicated(mesh)
        train_step = jax.jit(
            train_step.__wrapped__,
            in_shardings=(rep, rep, ray_sh, ray_sh, ray_sh),
            out_shardings=(rep, rep, rep),
        )

    oj, dj, tj = jnp.asarray(o), jnp.asarray(d), jnp.asarray(target)
    for step in range(step0, step0 + args.steps):
        loss, density, opt_state = train_step(density, opt_state, oj, dj, tj)
        if step % 5 == 0 or step == step0 + args.steps - 1:
            print(f"step {step:4d}  loss {float(loss):.6f}")
    np.savez(CKPT, density=np.asarray(density), step=step0 + args.steps)
    print(f"checkpoint -> {CKPT}")


def sharded(args):
    """Train through parallel/pipeline.py: grid x-slab-sharded extraction,
    gathered mesh, ray-data-parallel cast — the composition a pod slice
    runs, exercised here on whatever devices are local."""
    from jax.sharding import Mesh

    from primitive3d_tpu.parallel.pipeline import sharded_sdf_fitting_loss

    kw = dict(vert_capacity=VC, face_capacity=FC, max_dist=100.0)
    o, d = rays()
    target = np.asarray(
        render_depth(jnp.asarray(target_scene()), o, d,
                     vert_capacity=VC, face_capacity=FC, max_dist=100.0).depth
    )
    print(f"target: {np.mean(target < 100.0):.2f} hit fraction")
    x, y, z = np.mgrid[:N, :N, :N].astype(np.float32)
    density = jnp.asarray(
        -((x - N / 2) ** 2 + (y - N / 2) ** 2 + (z - N / 2) ** 2
          - (N / 2.5) ** 2) / N)

    mesh = Mesh(np.array(jax.devices()), axis_names=("data",))
    print(f"sharded over {mesh.devices.size} device(s)")
    opt = optax.adam(3e-2)
    opt_state = opt.init(density)
    oj, dj, tj = jnp.asarray(o), jnp.asarray(d), jnp.asarray(target)

    @jax.jit
    def train_step(density, opt_state):
        loss, grad = jax.value_and_grad(
            lambda g: sharded_sdf_fitting_loss(mesh, g, oj, dj, tj, **kw)
        )(density)
        updates, opt_state = opt.update(grad, opt_state)
        return loss, optax.apply_updates(density, updates), opt_state

    for step in range(args.steps):
        loss, density, opt_state = train_step(density, opt_state)
        if step % 5 == 0 or step == args.steps - 1:
            print(f"step {step:4d}  loss {float(loss):.6f}")
    np.savez(CKPT, density=np.asarray(density), step=args.steps)
    print(f"checkpoint -> {CKPT}")


def flagship(args):
    """BASELINE config-5 scale: fit a 256^3 SDF to 1080p depth renders.

    ~270 ms/step on one v5e chip (see FLAGSHIP_r3.json); budgets measured by
    the counts pass with headroom so the whole optimisation trajectory fits.
    """
    from primitive3d_tpu.ops.marching_cubes import _counts_impl
    from primitive3d_tpu.render.camera import camera_rays

    n = 256
    ax = np.linspace(-1.0, 1.0, n, dtype=np.float32)
    x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
    rr = np.sqrt(x * x + y * y + z * z)
    truth = jnp.asarray(0.8 - rr)
    init = jnp.asarray(0.6 - rr)

    # budget on the LARGER surface (truth) with 30% headroom for growth
    nv, nf, vu, cu, na = (int(q) for q in _counts_impl(truth, jnp.float32(0)))
    pad = lambda q: -(-int(q * 1.3) // 4096) * 4096
    kw = dict(vert_capacity=pad(nv), face_capacity=pad(nf),
              vert_units=pad(vu), cube_units=pad(cu), active_capacity=pad(na),
              lower=(-1, -1, -1), upper=(1, 1, 1), max_dist=10.0,
              backend="pallas")

    cam = camera_rays(1088, 1920, (0.0, 0.0, 2.5), (0.0, 0.0, 0.0))
    o, d = jnp.asarray(cam.origins), jnp.asarray(cam.dirs)
    target = render_depth(truth, o, d, **kw).depth
    print(f"target: {float(jnp.mean(target < 10.0)):.2f} hit fraction")

    opt = optax.adam(5e-3)
    density = init
    opt_state = opt.init(density)

    @jax.jit
    def train_step(density, opt_state):
        loss, grad = jax.value_and_grad(
            lambda g: sdf_fitting_loss(g, o, d, target, **kw)
        )(density)
        updates, opt_state = opt.update(grad, opt_state)
        return loss, optax.apply_updates(density, updates), opt_state

    import time
    for step in range(args.steps):
        t0 = time.perf_counter()
        loss, density, opt_state = train_step(density, opt_state)
        lf = float(loss)  # sync
        print(f"step {step:3d}  loss {lf:.6f}  "
              f"({time.perf_counter() - t0:.2f}s)")
    np.savez(CKPT, density=np.asarray(density), step=args.steps)
    print(f"checkpoint -> {CKPT}")


if __name__ == "__main__":
    main()

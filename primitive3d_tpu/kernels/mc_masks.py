"""Fused Pallas kernel for the marching-cubes mask pass.

One sweep over the density grid produces the three edge-crossing masks and
the per-cube 8-bit corner mask (reference: the count kernel's re-detection
loops, src/prim3d/Utility/marching_cubes.cu:29-57). In pure XLA these are
four stencil passes over overlapping bool intermediates (~7 ms at 256^3);
here each X-slab is DMA'd into VMEM once (with a one-row +x halo) and all
four outputs are computed and written in a single pass.

Outputs are full-(X, Y, Z) int8/uint8 buffers; rows/cols beyond each mask's
natural extent ((X-1, Y, Z) for cx, etc.) are zero, so callers slice views —
exactly the shapes the XLA path produces.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

XB = 8  # grid rows per program


def _kernel(th_ref, dens_hbm, cx_ref, cy_ref, cz_ref, cm_ref, slab_ref,
            sem, *, Y, Z):
    pid = pl.program_id(0)
    cp = pltpu.make_async_copy(
        dens_hbm.at[pl.ds(pid * XB, XB + 1)], slab_ref, sem
    )
    cp.start()
    cp.wait()
    occ = (slab_ref[:] > th_ref[0]).astype(jnp.uint8)  # (XB+1, Y, Z)

    zx = jnp.zeros((XB, 1, Z), jnp.int8)
    zl = jnp.zeros((XB, Y, 1), jnp.int8)
    cx_ref[:] = (occ[:-1] ^ occ[1:]).astype(jnp.int8)
    cy = (occ[:XB, :-1, :] ^ occ[:XB, 1:, :]).astype(jnp.int8)
    cy_ref[:] = jnp.concatenate([cy, zx], axis=1)
    cz = (occ[:XB, :, :-1] ^ occ[:XB, :, 1:]).astype(jnp.int8)
    cz_ref[:] = jnp.concatenate([cz, zl], axis=2)

    o = occ
    m = (
        o[:XB, :-1, :-1]
        + (o[1:, :-1, :-1] << 1)
        + (o[1:, 1:, :-1] << 2)
        + (o[:XB, 1:, :-1] << 3)
        + (o[:XB, :-1, 1:] << 4)
        + (o[1:, :-1, 1:] << 5)
        + (o[1:, 1:, 1:] << 6)
        + (o[:XB, 1:, 1:] << 7)
    )  # (XB, Y-1, Z-1) uint8
    zxy = jnp.zeros((XB, 1, Z - 1), jnp.uint8)
    zzl = jnp.zeros((XB, Y, 1), jnp.uint8)
    cm_ref[:] = jnp.concatenate(
        [jnp.concatenate([m, zxy], axis=1), zzl], axis=2
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_masks(
    density: Array, thresh: Array, interpret: bool = False
) -> Tuple[Array, Array, Array, Array]:
    """(cx, cy, cz, cube_mask) as full-(X, Y, Z) int8/uint8 buffers.

    ``cx[:X-1]``, ``cy[:, :Y-1]``, ``cz[..., :Z-1]`` and
    ``cube_mask[:X-1, :Y-1, :Z-1]`` are the valid views.
    """
    X, Y, Z = density.shape
    G = -(-X // XB)
    padx = G * XB + 1 - X
    dens = jnp.concatenate(
        [density, jnp.broadcast_to(density[-1:], (padx, Y, Z))]
    )  # replicated pad rows -> zero crossings past the boundary

    out_spec = pl.BlockSpec((XB, Y, Z), lambda i, *_: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    shapes = [
        jax.ShapeDtypeStruct((G * XB, Y, Z), jnp.int8),
        jax.ShapeDtypeStruct((G * XB, Y, Z), jnp.int8),
        jax.ShapeDtypeStruct((G * XB, Y, Z), jnp.int8),
        jax.ShapeDtypeStruct((G * XB, Y, Z), jnp.uint8),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # thresh -> SMEM
        grid=(G,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[out_spec] * 4,
        scratch_shapes=[
            pltpu.VMEM((XB + 1, Y, Z), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    cx, cy, cz, cm = pl.pallas_call(
        functools.partial(_kernel, Y=Y, Z=Z),
        grid_spec=grid_spec,
        out_shape=shapes,
        interpret=interpret,
    )(jnp.reshape(thresh, (1,)).astype(jnp.float32), dens)
    return cx[: X - 1], cy[:X, : Y - 1], cz[:X, :, : Z - 1], cm[
        : X - 1, : Y - 1, : Z - 1
    ]

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

XB = 8  # grid rows per program (shrunk for big Y*Z; see fused_masks)


def _kernel(th_ref, dens_hbm, cx_ref, cy_ref, cz_ref, cm_ref, slab_ref,
            sem, *, Y, Z, xb):
    pid = pl.program_id(0)
    cp = pltpu.make_async_copy(
        dens_hbm.at[pl.ds(pid * xb, xb + 1)], slab_ref, sem
    )
    cp.start()
    cp.wait()
    occ = (slab_ref[:] > th_ref[0]).astype(jnp.int32)  # (xb+1, Y, Z)

    # Two Mosaic lowering rules shape this kernel: (1) vector arithmetic only
    # exists for i16/i32 — all mask math runs in i32 and truncates to
    # i8/u8 at the store; (2) shapes must keep the lane dim 128-aligned, so
    # neighbour shifts are edge-replicated concats on full (XB, Y, Z) shapes
    # instead of interior slices (the wrapper pads Y/Z). Replication makes
    # the shifted-off last row/col xor to zero, which is exactly the zero
    # padding the callers' valid-view slices expect.
    def sy(a):  # shift -1 in y, replicating the last row
        return jnp.concatenate([a[:, 1:, :], a[:, -1:, :]], axis=1)

    def sz(a):  # shift -1 in z, replicating the last col
        return jnp.concatenate([a[:, :, 1:], a[:, :, -1:]], axis=2)

    o00 = occ[:xb]
    o10 = occ[1:]
    cx_ref[:] = (o00 ^ o10).astype(jnp.int8)
    cy_ref[:] = (o00 ^ sy(o00)).astype(jnp.int8)
    cz_ref[:] = (o00 ^ sz(o00)).astype(jnp.int8)

    o01 = sy(o00)
    o11 = sy(o10)
    cm_ref[:] = (
        o00
        + (o10 << 1)
        + (o11 << 2)
        + (o01 << 3)
        + (sz(o00) << 4)
        + (sz(o10) << 5)
        + (sz(o11) << 6)
        + (sz(o01) << 7)
    ).astype(jnp.uint8)  # junk in the last y/z rows; sliced off by caller


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_masks(
    density: Array, thresh: Array, interpret: bool = False
) -> Tuple[Array, Array, Array, Array]:
    """(cx, cy, cz, cube_mask) as full-(X, Y, Z) int8/uint8 buffers.

    ``cx[:X-1]``, ``cy[:, :Y-1]``, ``cz[..., :Z-1]`` and
    ``cube_mask[:X-1, :Y-1, :Z-1]`` are the valid views.
    """
    X, Y, Z = density.shape
    # rows per program scale inversely with the slice area so the kernel's
    # scoped VMEM (f32 slab + 4 mask blocks + i32 intermediates) stays
    # bounded: XB = 8 up to 256^2 slices; a 512^3 grid (4x the slice) gets
    # XB = 2 — the fixed XB = 8 blew the 16 MB scoped-vmem limit there
    Yp_ = -(-Y // 32) * 32
    Zp_ = -(-Z // 128) * 128
    xb = max(1, min(XB, (XB * 256 * 256) // max(Yp_ * Zp_, 1)))
    G = -(-X // xb)
    padx = G * xb + 1 - X
    # Mosaic needs the (sublane, lane) dims of the int8 vectors tile-aligned
    # (a 66^3 grid lowers to vector<8x65x65xi8> adds, which fail); pad Y/Z by
    # edge replication -> zero crossings in the pads, sliced off below.
    Yp = -(-Y // 32) * 32
    Zp = -(-Z // 128) * 128
    dens = jnp.pad(
        jnp.concatenate(
            [density, jnp.broadcast_to(density[-1:], (padx, Y, Z))]
        ),  # replicated pad rows -> zero crossings past the boundary
        ((0, 0), (0, Yp - Y), (0, Zp - Z)),
        mode="edge",
    )
    Y, Z = Yp, Zp

    out_spec = pl.BlockSpec((xb, Y, Z), lambda i, *_: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    shapes = [
        jax.ShapeDtypeStruct((G * xb, Y, Z), jnp.int8),
        jax.ShapeDtypeStruct((G * xb, Y, Z), jnp.int8),
        jax.ShapeDtypeStruct((G * xb, Y, Z), jnp.int8),
        jax.ShapeDtypeStruct((G * xb, Y, Z), jnp.uint8),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # thresh -> SMEM
        grid=(G,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[out_spec] * 4,
        scratch_shapes=[
            pltpu.VMEM((xb + 1, Y, Z), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    cx, cy, cz, cm = pl.pallas_call(
        functools.partial(_kernel, Y=Y, Z=Z, xb=xb),
        grid_spec=grid_spec,
        out_shape=shapes,
        interpret=interpret,
    )(jnp.reshape(thresh, (1,)).astype(jnp.float32), dens)
    X, Y, Z = density.shape
    return (
        cx[: X - 1, :Y, :Z],
        cy[:X, : Y - 1, :Z],
        cz[:X, :Y, : Z - 1],
        cm[: X - 1, : Y - 1, : Z - 1],
    )

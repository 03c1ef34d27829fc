"""Pallas TPU ray-casting kernel: two-level cluster traversal on VPU tiles.

The performance path replacing the reference's CUDA ``raytrace_kernel``
(reference: src/prim3d/Geometry/bvh.cu:311-346 — one thread per ray, stack
traversal, sorted 4-wide children). TPU-shaped instead of CUDA-shaped:

  * Rays are processed 1024 per program as (8, 128) f32 tiles — one VPU tile
    per ray-vector component. No per-ray stacks, no divergence: control flow
    is per *cluster*, decided by the scalar unit.
  * The whole acceleration structure (cluster AABBs + triangle SoA from
    bvh/clusters.py) lives in VMEM — for bunny-scale meshes (~1 MB) there is
    no HBM traffic in the inner loop at all.
  * Per cluster: a slab test of all 1024 rays at once; the cluster's 128
    triangles are only tested when some ray enters the box closer than its
    current best hit (``@pl.when`` on a scalar any-reduce) — the cheap
    early-out that replaces stack ordering.
  * Inner loop: scalar-broadcast Möller-Trumbore — the triangle's 9 scalars
    (a, e1, e2) broadcast against the ray tiles; running (t, id) min kept in
    registers.

Exact same hit semantics as the other backends (double-sided, miss at
t < 0 or t >= max_dist).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..bvh.clusters import CLUSTER_SIZE, SUB_SIZE, ClusterBVH

Array = jax.Array

RAY_BLOCK = 1024  # rays per program of the scalar-broadcast kernels
MISS = jnp.float32(3.0e38)


GROUP = 32  # clusters per cull/process phase pair


def _kernel_ordered(order_ref, bound_ref, boxes_ref, sub_ref, tri_ref, ox_ref,
                    oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, depth_ref,
                    idx_ref, flags_ref, cidx_ref, subflags_ref, *,
                    num_clusters, cluster_size, max_dist):
    """Front-to-back variant: clusters visited in a per-block precomputed
    order with a conservative lower bound per group; once every ray's best
    hit is closer than the next group's bound, traversal stops (the analog
    of the reference's sorted-children early-out, bvh.cu:183-187, done at
    block granularity).

    ``order_ref``/``bound_ref`` are scalar-prefetch operands living in SMEM —
    dynamic scalar indexing along the lane dimension of VMEM arrays is not
    lowerable, SMEM indexing is.
    """
    blk = pl.program_id(0)
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    inv_x = 1.0 / dx
    inv_y = 1.0 / dy
    inv_z = 1.0 / dz

    best0 = jnp.full((8, 128), max_dist, jnp.float32)
    idx0 = jnp.full((8, 128), -1, jnp.int32)
    num_groups = (num_clusters + GROUP - 1) // GROUP

    def group_body(carry):
        g, best, bidx = carry

        def cull_body(j, _):
            e = jnp.minimum(g * GROUP + j, num_clusters - 1)
            c = order_ref[blk, e]
            cidx_ref[j] = c
            lx = boxes_ref[c, 0]
            ly = boxes_ref[c, 1]
            lz = boxes_ref[c, 2]
            hx = boxes_ref[c, 3]
            hy = boxes_ref[c, 4]
            hz = boxes_ref[c, 5]
            tx0 = (lx - ox) * inv_x
            tx1 = (hx - ox) * inv_x
            ty0 = (ly - oy) * inv_y
            ty1 = (hy - oy) * inv_y
            tz0 = (lz - oz) * inv_z
            tz1 = (hz - oz) * inv_z
            tmin = jnp.maximum(
                jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                jnp.minimum(tz0, tz1),
            )
            tmax = jnp.minimum(
                jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                jnp.maximum(tz0, tz1),
            )
            useful = (tmin <= tmax) & (tmax >= 0.0) & (tmin < best)
            in_range = (g * GROUP + j) < num_clusters
            flags_ref[j] = (
                jnp.any(useful).astype(jnp.int32) * in_range.astype(jnp.int32)
            )
            return 0

        jax.lax.fori_loop(0, GROUP, cull_body, 0)

        def proc_body(j, carry):
            best, bidx = carry
            c = cidx_ref[j]

            def with_cluster(carry):
                best, bidx = carry
                nsub = cluster_size // SUB_SIZE

                # second culling level: flags for the cluster's sub-boxes,
                # batched into SMEM (same stall-avoidance as the group phase)
                def subcull(sj, _):
                    lx = sub_ref[c, sj, 0]
                    ly = sub_ref[c, sj, 1]
                    lz = sub_ref[c, sj, 2]
                    hx = sub_ref[c, sj, 3]
                    hy = sub_ref[c, sj, 4]
                    hz = sub_ref[c, sj, 5]
                    tx0 = (lx - ox) * inv_x
                    tx1 = (hx - ox) * inv_x
                    ty0 = (ly - oy) * inv_y
                    ty1 = (hy - oy) * inv_y
                    tz0 = (lz - oz) * inv_z
                    tz1 = (hz - oz) * inv_z
                    tmn = jnp.maximum(
                        jnp.maximum(
                            jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)
                        ),
                        jnp.minimum(tz0, tz1),
                    )
                    tmx = jnp.minimum(
                        jnp.minimum(
                            jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)
                        ),
                        jnp.maximum(tz0, tz1),
                    )
                    use = (tmn <= tmx) & (tmx >= 0.0) & (tmn < best)
                    subflags_ref[sj] = jnp.any(use).astype(jnp.int32)
                    return 0

                jax.lax.fori_loop(0, nsub, subcull, 0)

                def tri_body(m, carry2):
                    best, bidx = carry2
                    ax = tri_ref[c, m, 0]
                    ay = tri_ref[c, m, 1]
                    az = tri_ref[c, m, 2]
                    e1x = tri_ref[c, m, 3]
                    e1y = tri_ref[c, m, 4]
                    e1z = tri_ref[c, m, 5]
                    e2x = tri_ref[c, m, 6]
                    e2y = tri_ref[c, m, 7]
                    e2z = tri_ref[c, m, 8]
                    hx_ = dy * e2z - dz * e2y
                    hy_ = dz * e2x - dx * e2z
                    hz_ = dx * e2y - dy * e2x
                    det = e1x * hx_ + e1y * hy_ + e1z * hz_
                    f = 1.0 / jnp.where(det == 0.0, 1e-30, det)
                    sx = ox - ax
                    sy = oy - ay
                    sz = oz - az
                    u = f * (sx * hx_ + sy * hy_ + sz * hz_)
                    qx = sy * e1z - sz * e1y
                    qy = sz * e1x - sx * e1z
                    qz = sx * e1y - sy * e1x
                    v = f * (dx * qx + dy * qy + dz * qz)
                    t = f * (e2x * qx + e2y * qy + e2z * qz)
                    ok = (
                        (det != 0.0)
                        & (u >= 0.0)
                        & (u <= 1.0)
                        & (v >= 0.0)
                        & ((u + v) <= 1.0)
                        & (t >= 0.0)
                        & (t < best)
                    )
                    best = jnp.where(ok, t, best)
                    bidx = jnp.where(ok, c * cluster_size + m, bidx)
                    return best, bidx

                def sub_body(sj, carry2):
                    def with_sub(carry3):
                        b, bi = carry3
                        return jax.lax.fori_loop(
                            sj * SUB_SIZE, (sj + 1) * SUB_SIZE, tri_body, (b, bi)
                        )

                    return jax.lax.cond(
                        subflags_ref[sj] != 0, with_sub, lambda cr: cr, carry2
                    )

                return jax.lax.fori_loop(0, nsub, sub_body, (best, bidx))

            return jax.lax.cond(
                flags_ref[j] != 0, with_cluster, lambda cr: cr, (best, bidx)
            )

        best, bidx = jax.lax.fori_loop(0, GROUP, proc_body, (best, bidx))
        return g + 1, best, bidx

    def group_cond(carry):
        g, best, bidx = carry
        # converged when every ray's best hit is closer than the next
        # group's conservative entry lower bound
        nb = bound_ref[blk, jnp.minimum(g, bound_ref.shape[1] - 1)]
        return (g < num_groups) & jnp.logical_not(jnp.all(best <= nb))

    _, best, bidx = jax.lax.while_loop(
        group_cond, group_body, (jnp.int32(0), best0, idx0)
    )
    depth_ref[:] = best
    idx_ref[:] = bidx


def _kernel(boxes_ref, tri_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref,
            dz_ref, depth_ref, idx_ref, flags_ref, *, num_clusters,
            cluster_size, max_dist):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    inv_x = 1.0 / dx
    inv_y = 1.0 / dy
    inv_z = 1.0 / dz

    best0 = jnp.full((8, 128), max_dist, jnp.float32)
    idx0 = jnp.full((8, 128), -1, jnp.int32)
    num_groups = (num_clusters + GROUP - 1) // GROUP

    def group_body(g, carry):
        best, bidx = carry

        # --- vector phase: cull flags for the whole group, no branches ------
        # The any-reduce -> scalar transfer has long latency; batching GROUP
        # of them back-to-back keeps the vector pipeline full, and the scalar
        # loop below branches on cheap SMEM loads instead of waiting on a
        # fresh vector reduction per cluster.
        def cull_body(j, _):
            c = jnp.minimum(g * GROUP + j, num_clusters - 1)
            lx = boxes_ref[c, 0]
            ly = boxes_ref[c, 1]
            lz = boxes_ref[c, 2]
            hx = boxes_ref[c, 3]
            hy = boxes_ref[c, 4]
            hz = boxes_ref[c, 5]
            tx0 = (lx - ox) * inv_x
            tx1 = (hx - ox) * inv_x
            ty0 = (ly - oy) * inv_y
            ty1 = (hy - oy) * inv_y
            tz0 = (lz - oz) * inv_z
            tz1 = (hz - oz) * inv_z
            tmin = jnp.maximum(
                jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                jnp.minimum(tz0, tz1),
            )
            tmax = jnp.minimum(
                jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                jnp.maximum(tz0, tz1),
            )
            useful = (tmin <= tmax) & (tmax >= 0.0) & (tmin < best)
            in_range = (g * GROUP + j) < num_clusters
            flags_ref[j] = (
                jnp.any(useful).astype(jnp.int32) * in_range.astype(jnp.int32)
            )
            return 0

        jax.lax.fori_loop(0, GROUP, cull_body, 0)

        # --- scalar phase: process flagged clusters -------------------------
        def proc_body(j, carry):
            best, bidx = carry
            c = g * GROUP + j

            def with_cluster(carry):
                best, bidx = carry
                return _tri_loop(c, best, bidx)

            return jax.lax.cond(
                flags_ref[j] != 0, with_cluster, lambda cr: cr, (best, bidx)
            )

        def _tri_loop(c, best, bidx):
            def tri_body(m, carry2):
                best, bidx = carry2
                ax = tri_ref[c, m, 0]
                ay = tri_ref[c, m, 1]
                az = tri_ref[c, m, 2]
                e1x = tri_ref[c, m, 3]
                e1y = tri_ref[c, m, 4]
                e1z = tri_ref[c, m, 5]
                e2x = tri_ref[c, m, 6]
                e2y = tri_ref[c, m, 7]
                e2z = tri_ref[c, m, 8]
                # h = rd x e2
                hx_ = dy * e2z - dz * e2y
                hy_ = dz * e2x - dx * e2z
                hz_ = dx * e2y - dy * e2x
                det = e1x * hx_ + e1y * hy_ + e1z * hz_
                f = 1.0 / jnp.where(det == 0.0, 1e-30, det)
                sx = ox - ax
                sy = oy - ay
                sz = oz - az
                u = f * (sx * hx_ + sy * hy_ + sz * hz_)
                # q = s x e1
                qx = sy * e1z - sz * e1y
                qy = sz * e1x - sx * e1z
                qz = sx * e1y - sy * e1x
                v = f * (dx * qx + dy * qy + dz * qz)
                t = f * (e2x * qx + e2y * qy + e2z * qz)
                ok = (
                    (det != 0.0)
                    & (u >= 0.0)
                    & (u <= 1.0)
                    & (v >= 0.0)
                    & ((u + v) <= 1.0)
                    & (t >= 0.0)
                    & (t < best)
                )
                best = jnp.where(ok, t, best)
                bidx = jnp.where(ok, c * cluster_size + m, bidx)
                return best, bidx

            return jax.lax.fori_loop(0, cluster_size, tri_body, (best, bidx))

        return jax.lax.fori_loop(0, GROUP, proc_body, (best, bidx))

    best, bidx = jax.lax.fori_loop(0, num_groups, group_body, (best0, idx0))
    depth_ref[:] = best
    idx_ref[:] = bidx


def _order_and_bounds(bvh, o: Array, B: int, group: int = GROUP,
                      fine: int = 0, block: int = RAY_BLOCK):
    """Per-ray-block front-to-back cluster order + safe entry lower bounds.

    The bound is conservative for ANY ray in the block: a unit-direction ray
    travels at least point-box-distance(origin, box) before entering, minus
    the block's origin spread. Groups inherit the bound of their first
    (nearest) cluster since the order is ascending.
    """
    ob = o.reshape(B, block, 3)
    mo = jnp.mean(ob, axis=1)  # (B, 3)
    spread = jnp.max(jnp.linalg.norm(ob - mo[:, None], axis=-1), axis=1)
    lo = bvh.boxes[:, :3]
    hi = bvh.boxes[:, 3:]
    d = jnp.maximum(
        jnp.maximum(lo[None] - mo[:, None], mo[:, None] - hi[None]), 0.0
    )
    dist = jnp.linalg.norm(d, axis=-1)  # (B, C)
    bound = jnp.maximum(dist - spread[:, None], 0.0)
    order = jnp.argsort(bound, axis=1).astype(jnp.int32)
    sb = jnp.take_along_axis(bound, order, axis=1)
    C = bvh.num_clusters
    G = (C + group - 1) // group
    padg = G * group - C
    sb = jnp.concatenate(
        [sb, jnp.full((B, padg), jnp.inf, jnp.float32)], axis=1
    )
    group_bound = sb[:, ::group]  # (B, G): bound of each group's nearest
    if fine:
        return order, group_bound, sb[:, ::fine]
    return order, group_bound


RCHUNK = 256  # rays per chunk (flag/visit granularity)
MBLOCK = 2048  # rays per program of the MXU kernel
NCH = MBLOCK // RCHUNK


def _kernel_mxu_stream(n_ref, entries_ref, bounds_ref, w2_ref, *rest,
                       cluster_size, max_dist, rchunk=RCHUNK, nch=NCH,
                       with_fin=False, edge_wildcard=False):
    """HBM-streaming tier of the MXU cluster caster.

    Work list is one word per flagged cluster — ``(c << 16) | chunk_mask``
    (cluster-major, so SMEM cost is C words instead of the resident tier's
    C*NCH pairs) — and the per-cluster Plücker matrix ``w2[c]`` is DMA'd
    HBM -> VMEM through a 2-slot double buffer: entry e+1's fetch is started
    before entry e is processed, so the copy rides under e's 1-8 matmuls
    instead of serialising with them.

    Entries arrive FRONT-TO-BACK (sorted by the cluster's conservative entry
    lower bound over its flagged chunks, ``bounds_ref``), and the kernel
    keeps an NCH-bit convergence mask: chunk r is skipped once
    ``max(best[r]) <= bound[e]`` — every ray in the chunk already has a hit
    closer than any remaining cluster's entry point, so skipping is EXACT
    (the occlusion early-out of the reference's sorted-stack traversal,
    reference: src/prim3d/Geometry/bvh.cu:183-187, at chunk granularity).
    The mask refreshes every 4th entry (8 vector->scalar max-reduces cost a
    fraction of one visit's epilogue); the whole block exits when all chunks
    have converged.

    ``with_fin=True`` additionally selects each winning triangle's finish
    row (bvh.fin: normal, plane offset, 1/|n|, face id) in-kernel via a
    one-hot (8, S) x (S, rchunk) matmul — see :func:`_kernel_mxu`.
    """
    if with_fin:
        (fin_hbm_ref, r2_ref, depth_ref, idx_ref, fin_out_ref,
         w2s_ref, sem_w2, fins_ref, sem_fin) = rest
    else:
        r2_ref, depth_ref, idx_ref, w2s_ref, sem_w2 = rest
        fin_hbm_ref = fin_out_ref = fins_ref = sem_fin = None
    S = cluster_size
    tri_row = jax.lax.broadcasted_iota(jnp.int32, (S, rchunk), 0)
    im = jnp.int32(S - 1)
    brow = jax.lax.broadcasted_iota(jnp.int32, (nch, 1), 0)
    rows_chunk = jax.lax.broadcasted_iota(
        jnp.int32, (nch * 8, rchunk), 0) // 8

    # precision pinned to DEFAULT: accuracy comes from the explicit
    # double-bf16 split; a global jax_default_matmul_precision=highest would
    # otherwise stamp contract_precision<fp32> onto a bf16 matmul, which
    # Mosaic rejects ("Bad lhs type")
    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )

    n = n_ref[0, 0, 0]
    best0 = jnp.full((nch, rchunk), max_dist, jnp.float32)
    idx0 = jnp.full((nch, rchunk), -1, jnp.int32)
    # None is an empty pytree leaf-set: the fin state costs nothing in the
    # loop carry when disabled
    fin0 = jnp.zeros((nch * 8, rchunk), jnp.float32) if with_fin else None
    ALL = jnp.int32((1 << nch) - 1)

    def epilogue(c, r, full, fin_c, best, bidx, finst):
        s0 = full[0 * S:1 * S]
        s1 = full[1 * S:2 * S]
        s2 = full[2 * S:3 * S]
        num = full[3 * S:4 * S]
        # sign-agreement via sign BITS (3 xor + 2 or + 1 cmp, vs 6 min/max
        # + 2 cmp + 1 or): all four share a sign iff no pairwise xor sets
        # the sign bit. -0 counts as negative and +0 as positive (the
        # min/max form treated 0 as a wildcard) — an exactly-zero side
        # product is a ray through an edge, measure-zero in f32; padding
        # triangles (all +0) still pass and then lose as NaN in the packed
        # min.
        b0 = jax.lax.bitcast_convert_type(s0, jnp.int32)
        b1 = jax.lax.bitcast_convert_type(s1, jnp.int32)
        b2 = jax.lax.bitcast_convert_type(s2, jnp.int32)
        b3 = jax.lax.bitcast_convert_type(num, jnp.int32)
        if edge_wildcard:
            # opt-in watertight mode: an exactly-zero product (ray through
            # a shared edge / origin on the plane) agrees with ANY sign —
            # only nonzero products with differing signs reject. Padding
            # triangles (all zero) still pass and lose as NaN in the
            # packed min (num = den = 0 -> t = NaN).
            M = jnp.int32(0x7FFFFFFF)
            nz0 = (b0 & M) != 0
            nz1 = (b1 & M) != 0
            nz2 = (b2 & M) != 0
            nz3 = (b3 & M) != 0
            bad = (
                (((b0 ^ b1) < 0) & nz0 & nz1)
                | (((b0 ^ b2) < 0) & nz0 & nz2)
                | (((b0 ^ b3) < 0) & nz0 & nz3)
                | (((b1 ^ b2) < 0) & nz1 & nz2)
                | (((b1 ^ b3) < 0) & nz1 & nz3)
                | (((b2 ^ b3) < 0) & nz2 & nz3)
            )
            ok = jnp.logical_not(bad)
        else:
            ok = ((b0 ^ b1) | (b0 ^ b2) | (b0 ^ b3)) >= 0
        den = (s0 + s1) + s2
        rd = pl.reciprocal(den, approx=True)
        rd = rd * (2.0 - den * rd)
        t = num * rd
        tm = jnp.abs(jnp.where(ok, t, 3.0e38))
        ti = (jax.lax.bitcast_convert_type(tm, jnp.int32) & ~im) | tri_row
        tsel = jnp.min(ti, axis=0, keepdims=True)
        tb = jax.lax.bitcast_convert_type(tsel & ~im, jnp.float32)
        updr = (brow == r) & (tb < best)
        bidx = jnp.where(updr, c * S + (tsel & im), bidx)
        best = jnp.where(updr, tb, best)
        if with_fin:
            # winner's finish row via one-hot matmul: ti rows are unique
            # (low bits carry the triangle slot), so exactly one row of the
            # (S, rchunk) one-hot is set per lane and the bf16 matmul against
            # the exact bf16x3-split fin rows reproduces the f32 row to
            # faithful precision (integer fids below 2^24 exactly)
            # select in f32 first (the i1 mask lives in 32-bit (8, 128)
            # tiling; selecting bf16 directly would need an i1 relayout to
            # (16, 128) that Mosaic refuses), then convert
            onehot = jnp.where(
                ti == tsel, 1.0, 0.0
            ).astype(jnp.bfloat16)  # (S, rchunk)
            f3 = jax.lax.dot_general(
                fin_c, onehot,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )  # (24, rchunk)
            frow = (f3[0:8] + f3[8:16]) + f3[16:24]  # (8, rchunk)
            upd_lane = jnp.any(updr, axis=0, keepdims=True)  # (1, rchunk)
            ftile = jnp.concatenate([frow] * nch, axis=0)
            finst = jnp.where((rows_chunk == r) & upd_lane, ftile, finst)
        return best, bidx, finst

    # Prefetch pipeline depth: per-entry compute is tiny (1-2 matmuls), so
    # a 2-slot double buffer left every entry stalled on its DMA wait —
    # measured ~0.85 us of fixed cost per entry at bunny-x64 scale, 11 of
    # the 13 ms cast. Four slots with up to 3 outstanding fetches break the
    # serial wait -> process -> start chain (round-5 stream-tier fix).
    NSLOTS = 4

    def start_fetch(e):
        cn = entries_ref[0, 0, e] >> 16
        slot = e & (NSLOTS - 1)
        pltpu.make_async_copy(
            w2_ref.at[cn], w2s_ref.at[slot], sem_w2.at[slot]
        ).start()
        if with_fin:
            pltpu.make_async_copy(
                fin_hbm_ref.at[cn], fins_ref.at[slot], sem_fin.at[slot]
            ).start()

    for pre in range(NSLOTS - 1):
        @pl.when(pre < n)
        def _(pre=pre):
            start_fetch(pre)

    def body(st):
        e, conv, best, bidx, finst = st
        word = entries_ref[0, 0, e]
        c = word >> 16
        slot = e & (NSLOTS - 1)

        def refresh(_):
            bnd = bounds_ref[0, 0, e]
            bits = jnp.int32(0)
            for r in range(nch):
                bits |= jnp.where(
                    jnp.max(best[r]) <= bnd, jnp.int32(1 << r), 0
                )
            return bits

        conv = jax.lax.cond(
            (e & 3) == 0, refresh, lambda _: conv, None
        )
        mask = word & jnp.int32(0xFFFF) & ~conv

        pltpu.make_async_copy(
            w2_ref.at[c], w2s_ref.at[slot], sem_w2.at[slot]
        ).wait()
        if with_fin:
            pltpu.make_async_copy(
                fin_hbm_ref.at[c], fins_ref.at[slot], sem_fin.at[slot]
            ).wait()

        for r in range(nch):  # static unroll over the cluster's chunk bits
            def do(carry, r=r):
                b, bi, fs = carry
                full = dot(w2s_ref[slot], r2_ref[0, r])
                fin_c = fins_ref[slot] if with_fin else None
                return epilogue(c, r, full, fin_c, b, bi, fs)

            best, bidx, finst = jax.lax.cond(
                (mask >> r) & 1 != 0, do, lambda cr: cr,
                (best, bidx, finst)
            )

        # slot freed: refill it with entry e + NSLOTS - 1 (keeps up to
        # NSLOTS - 1 fetches outstanding while e + 1 .. e + NSLOTS - 2 are
        # already in flight)
        @pl.when(e + NSLOTS - 1 < n)
        def _():
            start_fetch(e + NSLOTS - 1)

        return e + 1, conv, best, bidx, finst

    def cond(st):
        return (st[0] < n) & (st[1] != ALL)

    ef, _, best, bidx, finst = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(0), best0, idx0, fin0)
    )

    # early convergence exit leaves up to NSLOTS - 1 prefetches in flight —
    # drain them so the scratch DMA semaphores are clean at kernel end
    for df in range(NSLOTS - 1):
        @pl.when(ef + df < n)
        def _(df=df):
            cn = entries_ref[0, 0, ef + df] >> 16
            slot = (ef + df) & (NSLOTS - 1)
            pltpu.make_async_copy(
                w2_ref.at[cn], w2s_ref.at[slot], sem_w2.at[slot]
            ).wait()
            if with_fin:
                pltpu.make_async_copy(
                    fin_hbm_ref.at[cn], fins_ref.at[slot], sem_fin.at[slot]
                ).wait()

    depth_ref[0] = best
    idx_ref[0] = bidx
    if with_fin:
        fin_out_ref[0] = finst


def _kernel_mxu(n_ref, pairs_ref, w2_ref, *rest, cluster_size, max_dist,
                rchunk=RCHUNK, nch=NCH, with_fin=False,
                edge_wildcard=False):
    """MXU cluster caster: one K=48 matmul per (cluster, 256-ray chunk).

    Layout rule: rays live in the LANE dimension everywhere — per-ray state
    (best t, best id) is a dense (nch, rchunk) value and matmul results are
    (tris, rays). A first draft used (rays, 1) column vectors; each was 128
    nearly-empty vregs and loop-carry copies dwarfed the arithmetic.

    The kernel does NO traversal decisions at all (flat work-list
    formulation): the host runs a conservative interval-arithmetic slab test
    of every 256-ray chunk's ray bounds against every cluster AABB and
    compacts the surviving (cluster, chunk) pairs into one flat per-block
    list. The kernel is a single while loop over that list — zero
    vector->scalar synchronizations, no flags, no convergence reductions.

    Measured rationale (bunny 512x512, 208 clusters): the interval cull
    alone leaves 44.7 pairs/block where full dynamic traversal (front-to-
    back order + per-run `t < best` convergence, the reference's sorted-
    stack analog, reference: src/prim3d/Geometry/bvh.cu:183-187) visits
    35.5 — the cull is already tight, so pruning the last ~20% of visits
    is not worth ANY per-run scalar round trips: three kernel generations
    with in-kernel culls or convergence words all lost to this design.

    Per visit: ONE K=48 bf16 matmul (see MxuClusterBVH.w2) producing the
    four Plücker products for all S triangles x RCHUNK rays, then a
    sign-agreement hit test and a single packed min-reduction — the low
    log2(S) mantissa bits of each t are overwritten with the in-cluster
    triangle index (monotone int32 compare == float compare for t >= 0), so
    no second eq+where+min pass is needed; depth loses only 2^-17 relative
    (the caller refines winners to exact f32, raycast._finish_hits).

    ``with_fin=True`` adds in-kernel selection of each winning triangle's
    finish row from ``bvh.fin`` (unnormalized normal, plane offset, 1/|n|,
    original face id — see build_mxu_clusters): the (S, rchunk) one-hot of
    the packed min right-multiplies the cluster's (8, S) fin matrix on the
    MXU, and the winning rows ride in the loop carry. This makes the full
    depth/normal/id production cast (reference writes all three in its one
    kernel pass, src/prim3d/Geometry/bvh.cu:330-345) an elementwise epilogue
    instead of ~6 dynamic gathers per ray at ~9 ns/element.
    """
    if with_fin:
        fin_in_ref, r2_ref, depth_ref, idx_ref, fin_out_ref = rest
    else:
        r2_ref, depth_ref, idx_ref = rest
        fin_in_ref = fin_out_ref = None
    S = cluster_size
    tri_row = jax.lax.broadcasted_iota(jnp.int32, (S, rchunk), 0)
    im = jnp.int32(S - 1)  # in-cluster index mask: log2(S) low mantissa bits
    brow = jax.lax.broadcasted_iota(jnp.int32, (nch, 1), 0)
    rows_chunk = jax.lax.broadcasted_iota(
        jnp.int32, (nch * 8, rchunk), 0) // 8

    # precision pinned to DEFAULT: accuracy comes from the explicit
    # double-bf16 split; a global jax_default_matmul_precision=highest would
    # otherwise stamp contract_precision<fp32> onto a bf16 matmul, which
    # Mosaic rejects ("Bad lhs type")
    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )

    n = n_ref[0, 0, 0]
    best0 = jnp.full((nch, rchunk), max_dist, jnp.float32)
    idx0 = jnp.full((nch, rchunk), -1, jnp.int32)
    fin0 = jnp.zeros((nch * 8, rchunk), jnp.float32) if with_fin else None

    def cond(st):
        return st[0] < n

    def load_and_dot(e):
        # clamped read: the tail lane of an odd-length list redoes the last
        # pair with its update masked off below
        p = pairs_ref[0, 0, jnp.minimum(e, n - 1)]
        nb = nch.bit_length() - 1
        c = p >> nb
        r = p & (nch - 1)
        # r2_ref: (1, NCH, 48, RCHUNK) bf16 [hi; lo; hi] per chunk
        # (host-side reduce_precision; see build_mxu_clusters). Indexed as
        # a ref: dynamic_slice of a loaded value does not lower.
        full = dot(w2_ref[c], r2_ref[0, r])  # (4S, RCHUNK)
        return c, r, full

    def epilogue(c, r, full, live, best, bidx, finst):
        s0 = full[0 * S:1 * S]
        s1 = full[1 * S:2 * S]
        s2 = full[2 * S:3 * S]
        num = full[3 * S:4 * S]
        # hit with t >= 0 iff the three side products AND the numerator
        # share a sign (num agreeing with den's sign == s-sign is exactly
        # t >= 0); den == 0 makes t inf or nan, whose bit patterns lose the
        # integer min below
        # sign-agreement via sign BITS (3 xor + 2 or + 1 cmp, vs 6 min/max
        # + 2 cmp + 1 or): all four share a sign iff no pairwise xor sets
        # the sign bit. -0 counts as negative and +0 as positive (the
        # min/max form treated 0 as a wildcard) — an exactly-zero side
        # product is a ray through an edge, measure-zero in f32; padding
        # triangles (all +0) still pass and then lose as NaN in the packed
        # min.
        b0 = jax.lax.bitcast_convert_type(s0, jnp.int32)
        b1 = jax.lax.bitcast_convert_type(s1, jnp.int32)
        b2 = jax.lax.bitcast_convert_type(s2, jnp.int32)
        b3 = jax.lax.bitcast_convert_type(num, jnp.int32)
        if edge_wildcard:
            # opt-in watertight mode: an exactly-zero product (ray through
            # a shared edge / origin on the plane) agrees with ANY sign —
            # only nonzero products with differing signs reject. Padding
            # triangles (all zero) still pass and lose as NaN in the
            # packed min (num = den = 0 -> t = NaN).
            M = jnp.int32(0x7FFFFFFF)
            nz0 = (b0 & M) != 0
            nz1 = (b1 & M) != 0
            nz2 = (b2 & M) != 0
            nz3 = (b3 & M) != 0
            bad = (
                (((b0 ^ b1) < 0) & nz0 & nz1)
                | (((b0 ^ b2) < 0) & nz0 & nz2)
                | (((b0 ^ b3) < 0) & nz0 & nz3)
                | (((b1 ^ b2) < 0) & nz1 & nz2)
                | (((b1 ^ b3) < 0) & nz1 & nz3)
                | (((b2 ^ b3) < 0) & nz2 & nz3)
            )
            ok = jnp.logical_not(bad)
        else:
            ok = ((b0 ^ b1) | (b0 ^ b2) | (b0 ^ b3)) >= 0
        # exact Plücker identity (see MxuClusterBVH): the three unnormalized
        # side products sum to rd.N
        den = (s0 + s1) + s2
        # approx reciprocal + one Newton-Raphson step: ~f32-accurate at a
        # fraction of a full divide's VPU passes
        rd = pl.reciprocal(den, approx=True)
        rd = rd * (2.0 - den * rd)
        t = num * rd
        # abs: a num == -0 edge-on case yields t = -0.0, whose bit pattern
        # is INT_MIN and would poison the packed integer min
        tm = jnp.abs(jnp.where(ok, t, 3.0e38))
        # low log2(S) mantissa bits <- triangle index; int32 order == float
        # order for non-negative floats
        ti = (jax.lax.bitcast_convert_type(tm, jnp.int32) & ~im) | tri_row
        tsel = jnp.min(ti, axis=0, keepdims=True)  # (1, RCHUNK)
        tb = jax.lax.bitcast_convert_type(tsel & ~im, jnp.float32)
        # tb broadcasts over rows; the row mask keeps the update on chunk r
        updr = (brow == r) & (tb < best) & live
        bidx = jnp.where(updr, c * S + (tsel & im), bidx)
        best = jnp.where(updr, tb, best)
        if with_fin:
            # winner's finish row via one-hot matmul (see the fin docstring
            # above): exactly one ti row equals the min (unique low index
            # bits); bf16x3-split rows make the bf16 selection f32-faithful
            # select in f32 first (the i1 mask lives in 32-bit (8, 128)
            # tiling; selecting bf16 directly would need an i1 relayout to
            # (16, 128) that Mosaic refuses), then convert
            onehot = jnp.where(
                ti == tsel, 1.0, 0.0
            ).astype(jnp.bfloat16)  # (S, rchunk)
            f3 = jax.lax.dot_general(
                fin_in_ref[c], onehot,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )  # (24, rchunk)
            frow = (f3[0:8] + f3[8:16]) + f3[16:24]  # (8, rchunk)
            upd_lane = jnp.any(updr, axis=0, keepdims=True)  # (1, rchunk)
            ftile = jnp.concatenate([frow] * nch, axis=0)
            finst = jnp.where((rows_chunk == r) & upd_lane, ftile, finst)
        return best, bidx, finst

    def body(st):
        # 4x unrolled: all dots issue before any epilogue, so the MXU
        # crunches later visits while the VPU reduces earlier ones — the
        # dot -> epilogue dependency was the dominant per-visit stall
        e, best, bidx, finst = st
        c0, r0, full0 = load_and_dot(e)
        c1, r1, full1 = load_and_dot(e + 1)
        c2, r2_, full2 = load_and_dot(e + 2)
        c3, r3, full3 = load_and_dot(e + 3)
        best, bidx, finst = epilogue(c0, r0, full0, True, best, bidx, finst)
        best, bidx, finst = epilogue(
            c1, r1, full1, e + 1 < n, best, bidx, finst)
        best, bidx, finst = epilogue(
            c2, r2_, full2, e + 2 < n, best, bidx, finst)
        best, bidx, finst = epilogue(
            c3, r3, full3, e + 3 < n, best, bidx, finst)
        return e + 4, best, bidx, finst

    _, best, bidx, finst = jax.lax.while_loop(
        cond, body, (jnp.int32(0), best0, idx0, fin0)
    )
    depth_ref[0] = best
    idx_ref[0] = bidx
    if with_fin:
        fin_out_ref[0] = finst


def _interval_cull(boxes, rint, max_dist):
    """Conservative slab test of per-chunk ray intervals vs cluster AABBs.

    boxes: (C, 6) cluster boxes; rint: (B, NCH, 12) per-chunk origin box +
    clamped inverse-direction bounds.

    Returns ok: (B, NCH, C) flags. All 8 endpoint products bound each ray's
    near/far crossing times, so a flag is a superset of the exact per-ray
    flags — measured within 0.3% of exact on camera blocks, at ~RCHUNK/8
    times less arithmetic.
    """
    tl = None
    th = None
    for a in range(3):
        L0 = boxes[None, None, :, a]  # (1, 1, C) lo plane
        L1 = boxes[None, None, :, a + 3]  # hi plane
        olo = rint[:, :, 2 * a, None]  # (B, NCH, 1)
        ohi = rint[:, :, 2 * a + 1, None]
        ivl = rint[:, :, 6 + 2 * a, None]
        ivh = rint[:, :, 7 + 2 * a, None]
        d00 = L0 - ohi  # (B, NCH, C)
        d01 = L0 - olo
        d10 = L1 - ohi
        d11 = L1 - olo
        prods = (d00 * ivl, d00 * ivh, d01 * ivl, d01 * ivh,
                 d10 * ivl, d10 * ivh, d11 * ivl, d11 * ivh)
        nr = prods[0]
        fr = prods[0]
        for q in prods[1:]:
            nr = jnp.minimum(nr, q)
            fr = jnp.maximum(fr, q)
        tl = nr if tl is None else jnp.maximum(tl, nr)
        th = fr if th is None else jnp.minimum(th, fr)
    ok = (tl <= th) & (th >= 0.0) & (tl < max_dist)
    # tl is a conservative lower bound on any chunk ray's box-entry time —
    # the front-to-back ordering / convergence bound of the stream kernel
    return ok, jnp.maximum(tl, 0.0)


def _ray_intervals(o: Array, d: Array, B: int, nch: int, rchunk: int):
    """Per-(block, chunk) ray intervals for the conservative cull: origin
    box + clamped inverse-direction bounds, interleaved
    [oxlo,oxhi,...,ozhi, ivxlo,ivxhi,...,ivzhi] -> (B, nch, 12)."""
    ob = o.reshape(B, nch, rchunk, 3)
    db = d.reshape(B, nch, rchunk, 3)
    ivb = jnp.clip(1.0 / db, -1e18, 1e18)  # finite: no 0*inf NaNs
    oint = jnp.stack(
        [jnp.min(ob, axis=2), jnp.max(ob, axis=2)], axis=-1
    ).reshape(B, nch, 6)
    ivint = jnp.stack(
        [jnp.min(ivb, axis=2), jnp.max(ivb, axis=2)], axis=-1
    ).reshape(B, nch, 6)
    return jnp.concatenate([oint, ivint], axis=-1)  # (B, nch, 12)


def _stream_entries(boxes: Array, rint: Array, max_dist: float, nch: int):
    """Streaming-tier work list from the interval cull: per block, one word
    per flagged cluster — ``(c << 16) | nch-bit chunk mask`` — sorted
    front-to-back by the cluster's conservative entry bound, plus the sorted
    bounds themselves (the kernel's convergence thresholds). Factored out of
    :func:`_mxu_prep` so the gradient scatter kernel (_kernel_plane_bwd) can
    rebuild the identical work list without the ray Plücker tensor."""
    B = rint.shape[0]
    C = boxes.shape[0]
    ok, tl = _interval_cull(boxes, rint, max_dist)  # (B, NCH, C)
    nondeg = jnp.any(boxes[:, 3:] > boxes[:, :3], axis=-1)
    ok = ok & nondeg[None, None, :]
    okc = ok.transpose(0, 2, 1)  # (B, C, NCH)
    bits = (1 << jnp.arange(nch, dtype=jnp.int32))[None, None, :]
    cmask = jnp.sum(okc.astype(jnp.int32) * bits, axis=-1)  # (B, C)
    cid = jax.lax.broadcasted_iota(jnp.int32, (B, C), 1)
    words = (cid << 16) | cmask
    # front-to-back: sort flagged clusters by their entry lower bound
    # (min over flagged chunks); the sorted bounds ride along to SMEM as
    # the kernel's convergence thresholds
    tlc = tl.transpose(0, 2, 1)  # (B, C, NCH)
    bound = jnp.min(
        jnp.where(okc, tlc, jnp.float32(3.0e38)), axis=-1
    )  # (B, C)
    flagged = (cmask > 0).astype(jnp.int32)
    _, _, entries, sbound = jax.lax.sort(
        (1 - flagged, bound, words, bound),
        dimension=1, num_keys=2, is_stable=True,
    )
    n = jnp.sum(cmask > 0, axis=1).astype(jnp.int32)[:, None, None]
    return n, entries[:, None], sbound[:, None]


def _mxu_prep(bvh, o: Array, d: Array, max_dist: float, stream: bool,
              rchunk: int = RCHUNK, nch: int = NCH):
    """Host-side prep for the MXU cluster kernels (pure XLA, timeable alone).

    ``o``/``d`` are already padded to a multiple of MBLOCK. Returns
    ``(n, work, r2)``: per-block work-list lengths (B, 1, 1) for SMEM, the
    flat work list (B, 1, ...) for SMEM — (cluster, chunk) pairs for the
    VMEM-resident tier, ``(c << 16) | 16-bit chunk-mask`` cluster words for
    the streaming tier (8x less SMEM; entry boundaries == cluster changes,
    which the double-buffered w2 prefetch keys on) — and the double-bf16 ray
    Plücker tensor r2 (B, nch, 48, rchunk).
    """
    Rp = o.shape[0]
    B = Rp // MBLOCK
    C = bvh.num_clusters

    m = jnp.cross(o, d)
    ones = jnp.ones((Rp, 1), jnp.float32)
    rvec = jnp.concatenate(
        [d, m, o, ones, jnp.zeros((Rp, 6), jnp.float32)], axis=1
    )  # (Rp, 16)
    rvt = rvec.reshape(B, nch, rchunk, 16).transpose(0, 1, 3, 2)
    rvh32 = jax.lax.reduce_precision(rvt, exponent_bits=8, mantissa_bits=7)
    rvh = rvh32.astype(jnp.bfloat16)
    rvl = (rvt - rvh32).astype(jnp.bfloat16)
    r2 = jnp.concatenate(
        [rvh, rvl, rvh], axis=2
    )  # (B, NCH, 48, RCHUNK) [hi;lo;hi]

    rint = _ray_intervals(o, d, B, nch, rchunk)  # (B, NCH, 12)

    # flat work list from the interval cull
    if stream:
        n, entries, sbound = _stream_entries(
            bvh.boxes, rint, max_dist, nch)
        return n, entries, sbound, r2
    ok, tl = _interval_cull(bvh.boxes, rint, max_dist)  # (B, NCH, C)
    # drop degenerate clusters (zero-extent boxes): capacity-padded meshes
    # (marching_cubes_padded -> vertices[faces] with 0-padded faces) produce
    # whole clusters of point triangles that can never be hit but whose
    # point boxes would otherwise pass the slab test for any ray near them
    nondeg = jnp.any(bvh.boxes[:, 3:] > bvh.boxes[:, :3], axis=-1)
    ok = ok & nondeg[None, None, :]

    # (cluster, chunk) pairs compacted to the front, cluster-major
    okt = ok.transpose(0, 2, 1).reshape(B, C * nch)
    pid = jax.lax.broadcasted_iota(jnp.int32, (B, C * nch), 1)
    _, pairs = jax.lax.sort(
        (jnp.where(okt, 0, 1).astype(jnp.int32), pid), dimension=1,
        num_keys=1, is_stable=True,
    )
    n = jnp.sum(okt, axis=1).astype(jnp.int32)[:, None, None]  # (B, 1, 1)
    return n, pairs[:, None], None, r2


@functools.partial(
    jax.jit,
    static_argnames=("max_dist", "interpret", "stream", "rchunk",
                     "with_fin", "edge_wildcard"),
)
def cast_clusters_mxu(
    bvh,
    origins: Array,
    dirs: Array,
    max_dist: float = 10.0,
    interpret: bool = False,
    stream: bool = False,
    rchunk: int = RCHUNK,
    with_fin: bool = False,
    edge_wildcard: bool = False,
) -> Tuple[Array, ...]:
    """Closest hit via the MXU cluster kernel: (t, sorted-triangle index).

    ``bvh`` is a :class:`~primitive3d_tpu.bvh.clusters.MxuClusterBVH`. Same
    result convention as :func:`cast_clusters`. By default the whole Plücker
    tensor lives in VMEM (384 B/triangle) — meshes up to ~32k triangles.
    ``stream=True`` keeps it in HBM and DMAs each visited cluster's matrix
    into VMEM scratch, raising the cap to ~2M triangles; beyond that use
    :func:`cast_clusters`.

    ``with_fin=True`` returns a third array (R, 8) — each ray's winning
    finish row [n, a.n, 1/|n|, fid, 0, 0] selected in-kernel (zeros for
    misses; gate on ``sidx >= 0``) — letting the caller produce the full
    depth/normal/primitive-id buffers with pure elementwise math.
    """
    nch = MBLOCK // rchunk
    if stream:
        # the stream work word packs (cluster_id << 16) | nch-bit chunk mask
        # into one int32: the id must stay below the sign bit and the mask
        # within 16 bits, or the kernel's `word >> 16` / `word & 0xFFFF`
        # silently corrupt cluster ids / drop chunks
        if bvh.num_clusters > 32767:
            raise ValueError(
                f"stream tier supports at most 32767 clusters, got "
                f"{bvh.num_clusters}; raise cluster_size"
            )
        if not (128 <= rchunk <= MBLOCK and rchunk & (rchunk - 1) == 0):
            raise ValueError(
                f"stream tier needs rchunk a power of two in [128, {MBLOCK}] "
                f"(16-bit chunk mask), got {rchunk}"
            )
    R = origins.shape[0]
    pad = (-R) % MBLOCK
    o = jnp.concatenate([origins, jnp.zeros((pad, 3), jnp.float32)])
    d = jnp.concatenate([dirs, jnp.ones((pad, 3), jnp.float32)])
    Rp = R + pad
    B = Rp // MBLOCK
    n, work, bounds, r2 = _mxu_prep(bvh, o, d, float(max_dist), stream,
                                    rchunk, nch)
    C = bvh.num_clusters
    r2_spec = pl.BlockSpec((1, nch, 48, rchunk), lambda i: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, nch, rchunk), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((B, nch, rchunk), jnp.float32),
        jax.ShapeDtypeStruct((B, nch, rchunk), jnp.int32),
    ]
    out_specs = [out_spec, out_spec]
    if with_fin:
        out_shape.append(
            jax.ShapeDtypeStruct((B, nch * 8, rchunk), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, nch * 8, rchunk), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM))
    n_spec = pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                          memory_space=pltpu.SMEM)

    def finish(outs):
        if not with_fin:
            depth, idx = outs
            return depth.reshape(Rp)[:R], idx.reshape(Rp)[:R]
        depth, idx, fin = outs
        finr = fin.reshape(B, nch, 8, rchunk).transpose(0, 1, 3, 2)
        return (depth.reshape(Rp)[:R], idx.reshape(Rp)[:R],
                finr.reshape(Rp, 8)[:R])

    if stream:
        csmem = pl.BlockSpec((1, 1, C), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM)
        # 4 slots (matches NSLOTS in _kernel_mxu_stream): ~0.4 MB of w2
        # scratch at S=256 buys 3 outstanding prefetches
        scratch = [
            pltpu.VMEM((4, 48, 4 * bvh.cluster_size), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((4,)),
        ]
        fin_ops = []
        if with_fin:
            scratch += [
                pltpu.VMEM((4, 24, bvh.cluster_size), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((4,)),
            ]
            fin_ops = [pl.BlockSpec(memory_space=pl.ANY)]  # fin in HBM
        grid_spec = pl.GridSpec(
            grid=(B,),
            in_specs=[
                n_spec,
                csmem,  # entries
                csmem,  # per-entry front-to-back bounds (f32)
                pl.BlockSpec(memory_space=pl.ANY),  # w2 stays in HBM
                *fin_ops,
                r2_spec,
            ],
            out_specs=out_specs,
            scratch_shapes=scratch,
        )
        kernel = functools.partial(
            _kernel_mxu_stream, cluster_size=bvh.cluster_size,
            max_dist=float(max_dist), rchunk=rchunk, nch=nch,
            with_fin=with_fin, edge_wildcard=edge_wildcard,
        )
        operands = ([n, work, bounds, bvh.w2, bvh.fin, r2] if with_fin
                    else [n, work, bounds, bvh.w2, r2])
        outs = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(*operands)
        return finish(outs)
    else:
        fin_ops = ([pl.BlockSpec(memory_space=pltpu.VMEM)] if with_fin
                   else [])
        grid_spec = pl.GridSpec(
            grid=(B,),
            in_specs=[
                n_spec,
                pl.BlockSpec((1, 1, C * nch), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),  # pairs
                pl.BlockSpec(memory_space=pltpu.VMEM),
                *fin_ops,
                r2_spec,
            ],
            out_specs=out_specs,
        )
        kernel = functools.partial(
            _kernel_mxu, cluster_size=bvh.cluster_size,
            max_dist=float(max_dist), rchunk=rchunk, nch=nch,
            with_fin=with_fin, edge_wildcard=edge_wildcard,
        )

    operands = ([n, work, bvh.w2, bvh.fin, r2] if with_fin
                else [n, work, bvh.w2, r2])
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(*operands)
    return finish(outs)


@functools.partial(
    jax.jit, static_argnames=("max_dist", "interpret", "ordered")
)
def cast_clusters(
    bvh: ClusterBVH,
    origins: Array,
    dirs: Array,
    max_dist: float = 10.0,
    interpret: bool = False,
    ordered: bool = True,
) -> Tuple[Array, Array]:
    """Closest hit for rays (R, 3): returns (t, sorted-triangle index).

    R is padded to a multiple of RAY_BLOCK internally; indices refer to the
    Morton-sorted order (map through ``bvh.prim_order`` for original ids).
    ``ordered=True`` adds per-block front-to-back cluster ordering with a
    convergence early-exit (helps coherent ray blocks; always exact).
    """
    R = origins.shape[0]
    pad = (-R) % RAY_BLOCK
    o = jnp.concatenate([origins, jnp.zeros((pad, 3), jnp.float32)])
    d = jnp.concatenate([dirs, jnp.ones((pad, 3), jnp.float32)])
    Rp = R + pad
    rows = Rp // 128

    comps = [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2]]
    comps = [c.reshape(rows, 128) for c in comps]

    C = bvh.num_clusters
    B = rows // 8
    grid = (B,)
    ray_spec = pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_specs = [
        pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((rows, 128), jnp.float32),
        jax.ShapeDtypeStruct((rows, 128), jnp.int32),
    ]
    kw = dict(
        num_clusters=C,
        cluster_size=bvh.tri_data.shape[1],
        max_dist=float(max_dist),
    )
    if ordered:
        order, gbound = _order_and_bounds(bvh, o, B)
        # index maps under PrefetchScalarGridSpec also receive the scalar
        # prefetch refs after the grid indices
        ray_spec_p = pl.BlockSpec(
            (8, 128), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        )
        out_specs_p = [ray_spec_p, ray_spec_p]
        nsub = bvh.tri_data.shape[1] // SUB_SIZE
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # order + bounds land in SMEM
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # boxes
                pl.BlockSpec(memory_space=pltpu.VMEM),  # sub_boxes
                pl.BlockSpec(memory_space=pltpu.VMEM),  # tri_data
                *[ray_spec_p] * 6,
            ],
            out_specs=out_specs_p,
            scratch_shapes=[
                pltpu.SMEM((GROUP,), jnp.int32),
                pltpu.SMEM((GROUP,), jnp.int32),
                pltpu.SMEM((nsub,), jnp.int32),
            ],
        )
        depth, idx = pl.pallas_call(
            functools.partial(_kernel_ordered, **kw),
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(order, gbound, bvh.boxes, bvh.sub_boxes, bvh.tri_data, *comps)
    else:
        depth, idx = pl.pallas_call(
            functools.partial(_kernel, **kw),
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                *[ray_spec] * 6,
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[pltpu.SMEM((GROUP,), jnp.int32)],
            interpret=interpret,
        )(bvh.boxes, bvh.tri_data, *comps)
    return depth.reshape(Rp)[:R], idx.reshape(Rp)[:R]


@functools.partial(jax.custom_jvp, nondiff_argnums=(3, 4, 5, 6))
def _mxu_sidx_nodiff(bvh, origins, dirs, max_dist, interpret, stream,
                     use_mxu):
    """Hit finding opaque to AD.

    The hit assignment is discrete, so its tangent is zero by definition —
    but without this wrapper, jvp tracing still reaches the pallas_call,
    whose generic jvp rule DOUBLES every operand (primal + tangent); at
    flagship scale the doubled SMEM work list (2 x B x C words ~ 27 MB)
    exceeds the 1 MB SMEM and the backward pass fails to compile.
    """
    if use_mxu:
        _, sidx = cast_clusters_mxu(
            bvh, origins, dirs, max_dist=max_dist, interpret=interpret,
            stream=stream,
        )
    else:
        _, sidx = cast_clusters(
            bvh, origins, dirs, max_dist=max_dist, interpret=interpret
        )
    return sidx


@_mxu_sidx_nodiff.defjvp
def _mxu_sidx_nodiff_jvp(max_dist, interpret, stream, use_mxu, primals,
                         tangents):
    import numpy as np  # float0 tangent for the int32 output

    sidx = _mxu_sidx_nodiff(*primals, max_dist, interpret, stream, use_mxu)
    return sidx, np.zeros(sidx.shape, dtype=jax.dtypes.float0)


@functools.partial(jax.custom_jvp, nondiff_argnums=(3, 4, 5))
def _mxu_fin_nodiff(bvh, origins, dirs, max_dist, interpret, stream):
    """Hit finding + in-kernel finish selection, opaque to AD (the hit
    assignment is discrete; see _mxu_sidx_nodiff for why the wrapper is
    load-bearing at flagship scale)."""
    _, sidx, finr = cast_clusters_mxu(
        bvh, origins, dirs, max_dist=max_dist, interpret=interpret,
        stream=stream, with_fin=True,
    )
    return sidx, finr


@_mxu_fin_nodiff.defjvp
def _mxu_fin_nodiff_jvp(max_dist, interpret, stream, primals, tangents):
    import numpy as np

    sidx, finr = _mxu_fin_nodiff(*primals, max_dist, interpret, stream)
    return (sidx, finr), (
        np.zeros(sidx.shape, dtype=jax.dtypes.float0), jnp.zeros_like(finr)
    )


@jax.custom_vjp
def _planes_select(planes, prim, fin4):
    """Semantically ``planes[max(prim, 0)]`` — but the forward returns the
    kernel's pre-selected rows ``fin4`` (same per-face data, selected on the
    MXU by the one-hot matmul) so NO per-ray gather runs at all; only the
    backward pays for the scatter-add of the cotangent into face space.
    The two sides may differ by ~1 ulp (cross() association order inside
    different jits), which perturbs neither the hit assignment nor gradient
    validity (gradients hold the hit fixed by construction)."""
    return fin4


def _planes_select_fwd(planes, prim, fin4):
    return fin4, (planes, prim)


def _planes_select_bwd(res, g):
    import numpy as np

    planes, prim = res
    ok = (prim >= 0)[:, None]
    dplanes = jnp.zeros_like(planes).at[jnp.maximum(prim, 0)].add(
        jnp.where(ok, g, 0.0)
    )
    return (dplanes, np.zeros(prim.shape, dtype=jax.dtypes.float0),
            jnp.zeros_like(g))


_planes_select.defvjp(_planes_select_fwd, _planes_select_bwd)


def _kernel_plane_bwd(n_ref, entries_ref, widx_ref, g4_ref, out_ref, *,
                      cluster_size, cb, nch, rchunk):
    """Work-list gradient scatter: plane cotangents -> cluster-space rows.

    The transpose of the winner-plane selection is a scatter-add of each
    ray's (4,) cotangent into its winning triangle's row — XLA's dynamic
    scatter costs ~80 ms in the flagship grad program (2M rays, 400k
    faces). This kernel instead REUSES the forward's cluster work list:
    for each (cluster, ray-chunk) visit, the (S, rchunk) winner one-hot
    (the same cheap lane-major compare the forward's fin selection uses —
    no gathers, no sorts) left-multiplies the chunk's (rchunk, 4)
    cotangents on the MXU; the per-entry (S, 4) sum is transposed once and
    accumulated into the cluster's resident (4, S) output rows. Rays whose
    winner is NOT in this cluster contribute exact zeros, so revisiting a
    converged chunk is harmless (the forward's convergence mask is a
    subset of the work list).

    Grid is (JC, B): ``j`` slices the cluster range into ``cb``-cluster
    output blocks that fit VMEM; ``b`` walks ray blocks with the output
    block resident (zeroed at b == 0, complete after the last b).
    """
    S = cluster_size
    j = pl.program_id(0)
    b = pl.program_id(1)

    @pl.when(b == 0)
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    n = n_ref[0, 0, 0]
    sub_s = jax.lax.broadcasted_iota(jnp.int32, (S, rchunk), 0)
    lo = j * cb

    # HIGHEST: with f32 operands, DEFAULT would run a single bf16 MXU pass,
    # truncating the cotangents to ~8 mantissa bits — the streaming tier's
    # gradients would diverge from the resident tier's exact f32 scatter-add
    # (round-5 advisor fix). The dot is (S, rchunk) x (rchunk, 4): N = 4, so
    # the extra exactness passes are nearly free. (The forward fin path gets
    # exactness from its bf16x3 operand split instead; its operands are
    # bf16, where DEFAULT is the correct pin — see _kernel_mxu_fin.)
    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    def body(e, _):
        word = entries_ref[0, 0, e]
        c = word >> 16
        cl = c - lo

        @pl.when((cl >= 0) & (cl < cb))
        def _():
            mask = word & jnp.int32(0xFFFF)
            base = c * S
            dpT = jnp.zeros((S, 4), jnp.float32)
            for r in range(nch):
                def do(dpT, r=r):
                    w = widx_ref[0, r]  # (1, rchunk) winner sorted index
                    onehot = jnp.where(
                        w - base == sub_s, 1.0, 0.0)  # (S, rchunk)
                    return dpT + dot(onehot, g4_ref[0, r])  # (S, 4)

                dpT = jax.lax.cond(
                    (mask >> r) & 1 != 0, do, lambda d_: d_, dpT)
            out_ref[cl] = out_ref[cl] + dpT.T
        return 0

    jax.lax.fori_loop(0, n, body, 0)


def _plane_scatter_ws(g, widx, n, entries, C: int, S: int, nch: int,
                      rchunk: int, interpret: bool):
    """Scatter per-ray plane cotangents ``g`` (B*nch*rchunk, 4) into sorted
    cluster space via the work-list kernel; returns (C*S, 4)."""
    B = n.shape[0]
    widx4 = widx.reshape(B, nch, 1, rchunk)
    g4 = g.reshape(B, nch, rchunk, 4)  # rays in sublanes — natural layout
    cb = min(C, 1024)  # ~4 MB of (cb, 4->8, S) f32 output block in VMEM
    JC = -(-C // cb)
    out = pl.pallas_call(
        functools.partial(
            _kernel_plane_bwd, cluster_size=S, cb=cb, nch=nch,
            rchunk=rchunk),
        grid=(JC, B),
        in_specs=[
            pl.BlockSpec((1, 1, 1), lambda j, b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, entries.shape[-1]), lambda j, b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nch, 1, rchunk), lambda j, b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nch, rchunk, 4), lambda j, b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cb, 4, S), lambda j, b: (j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((JC * cb, 4, S), jnp.float32),
        interpret=interpret,
    )(n, entries, widx4, g4)
    return out[:C].transpose(0, 2, 1).reshape(C * S, 4)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _planes_select_ws(max_dist, interpret, S, nch, rchunk, planes, prim,
                      fin4, sidx, boxes, o, d):
    """Winner-plane selection with a WORK-LIST gradient scatter.

    Same contract as :func:`_planes_select` (forward returns the kernel's
    pre-selected rows; zero gathers), but the backward rebuilds the
    streaming work list from (boxes, o, d) and runs _kernel_plane_bwd
    instead of XLA's elementwise scatter. Requires the bvh to be built in
    ``identity`` order (sorted cluster space maps to face space by
    reshape) and the streaming tier's work-word format.
    """
    return fin4


def _planes_select_ws_fwd(max_dist, interpret, S, nch, rchunk, planes, prim,
                          fin4, sidx, boxes, o, d):
    return fin4, (planes, prim, sidx, boxes, o, d)


def _planes_select_ws_bwd(max_dist, interpret, S, nch, rchunk, res, g):
    import numpy as np

    planes, prim, sidx, boxes, o, d = res
    T = planes.shape[0]
    C = boxes.shape[0]
    R = sidx.shape[0]
    pad = (-R) % MBLOCK
    gz = jnp.where((prim >= 0)[:, None], g, 0.0)
    gp = jnp.concatenate([gz, jnp.zeros((pad, 4), g.dtype)])
    wp = jnp.concatenate([sidx, jnp.full((pad,), -1, jnp.int32)])
    op = jnp.concatenate([o, jnp.zeros((pad, 3), jnp.float32)])
    dp_ = jnp.concatenate([d, jnp.ones((pad, 3), jnp.float32)])
    B = (R + pad) // MBLOCK
    rint = _ray_intervals(op, dp_, B, nch, rchunk)
    n, entries, _ = _stream_entries(boxes, rint, max_dist, nch)
    dsorted = _plane_scatter_ws(gp, wp, n, entries, C, S, nch, rchunk,
                                interpret)  # (C*S, 4)
    dplanes = dsorted[:T]
    zero_i = np.zeros(prim.shape, dtype=jax.dtypes.float0)
    return (dplanes, zero_i, jnp.zeros_like(g), zero_i,
            jnp.zeros_like(boxes), jnp.zeros_like(o), jnp.zeros_like(d))


_planes_select_ws.defvjp(_planes_select_ws_fwd, _planes_select_ws_bwd)



def cast_clusters_diff(
    tris: Array,
    origins: Array,
    dirs: Array,
    bvh=None,
    max_dist: float = 10.0,
    interpret: bool = False,
    mxu_max_tris: int = None,
    mxu_stream_max_tris: int = None,
) -> Tuple[Array, Array]:
    """Differentiable closest hit: (depth, original-triangle index).

    The MXU cluster kernel finds each ray's hit triangle (discrete,
    non-differentiable); depth is then recomputed from that triangle's plane
    equation ``t = (a - o).n / d.n`` so gradients flow to ``tris`` and the
    rays while the hit assignment is held fixed — the same convention as
    differentiable rasterisation and the pipeline's all-pairs MXU path
    (mxu_cast.py). ``bvh`` may be passed to reuse a prebuilt
    :class:`MxuClusterBVH`; otherwise one is built from ``tris`` (under
    ``stop_gradient``) each call.
    """
    from ..bvh.clusters import build_clusters, build_mxu_clusters
    from ..raycast import PallasRayCaster

    # same size tiers as PallasRayCaster, keyed on the actual triangle count
    cap = (PallasRayCaster.MXU_MAX_TRIS if mxu_max_tris is None
           else mxu_max_tris)
    scap = (32767 * CLUSTER_SIZE if mxu_stream_max_tris is None
            else mxu_stream_max_tris)  # stream work-word id limit
    T = tris.shape[0]
    use_mxu = bvh is not None or T <= scap
    tris_ng = jax.lax.stop_gradient(tris)
    identity = bvh is None and use_mxu
    if bvh is None:
        bvh = (build_mxu_clusters(tris_ng, order="identity") if use_mxu
               else build_clusters(tris_ng))
    o_ng = jax.lax.stop_gradient(origins)
    d_ng = jax.lax.stop_gradient(dirs)
    # Differentiable depth from the hit triangle's PLANE: per-FACE plane
    # rows (vector ops over the soup); gradients flow to the plane and
    # hence to ``tris`` exactly as with the per-ray cross-product
    # formulation: t = (a.n - o.n) / d.n.
    a, b, c = tris[:, 0], tris[:, 1], tris[:, 2]
    nrm = jnp.cross(b - a, c - a)  # (T, 3)
    planes = jnp.concatenate(
        [nrm, jnp.sum(a * nrm, axis=-1, keepdims=True)], axis=-1
    )  # (T, 4)
    if use_mxu:
        # MXU tiers run the with_fin kernel: the winner's plane row (n, a.n)
        # and original face id are selected in-kernel on the MXU, so the
        # forward does ZERO per-ray gathers (the old plane gather cost
        # ~70 ms at 1080p against a 400k-face mesh); only the backward pays
        # the scatter-add of plane cotangents into face space
        # (_planes_select). Clusters build in identity order: MC soups are
        # already spatially coherent, the reorder gather is skipped, and
        # cluster space maps back to face space by reshape.
        # Flagship-scale meshes (capacity-padded 256^3 extractions) exceed
        # the VMEM-resident Pluecker budget: stream clusters from HBM.
        sidx, finr = _mxu_fin_nodiff(
            bvh, o_ng, d_ng, float(max_dist), interpret, T > cap
        )
        fid_f = finr[:, 5]
        hit = (sidx >= 0) & (fid_f >= 0.0)
        prim = jnp.where(hit, fid_f.astype(jnp.int32), -1)
        if identity and T > cap:
            # streaming tier + identity order: the backward scatter runs
            # the work-list kernel (cluster-space rows -> face space by
            # reshape). Measured in the real flagship grad program: the
            # kernel path's backward costs ~50 ms of epilogue fwd+bwd vs
            # ~93 ms with XLA's scatter-add (~80 ms for the (2M,4) scatter
            # in context; a microbenchmark that embeds prim/cotangents as
            # constants constant-folds the scatter and reads 0.9 ms — do
            # not trust it).
            pr = _planes_select_ws(
                float(max_dist), interpret, bvh.cluster_size, NCH, RCHUNK,
                planes, prim, finr[:, :4], sidx, bvh.boxes, o_ng, d_ng,
            )
        else:
            pr = _planes_select(planes, prim, finr[:, :4])  # no gather
    else:
        sidx = _mxu_sidx_nodiff(
            bvh, o_ng, d_ng, float(max_dist), interpret, False, False
        )
        prim = bvh.prim_order[jnp.maximum(sidx, 0)]
        hit = (sidx >= 0) & (prim >= 0)
        pr = planes[jnp.maximum(prim, 0)]  # (R, 4)
    den = jnp.sum(dirs * pr[:, :3], axis=-1)
    num = pr[:, 3] - jnp.sum(origins * pr[:, :3], axis=-1)
    t = num / jnp.where(den == 0, 1e-30, den)
    depth = jnp.where(hit, t, jnp.float32(max_dist))
    return depth, jnp.where(hit, prim, -1)

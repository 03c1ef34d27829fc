"""Multi-chip marching tetrahedra: x-slab sharding of the Kuhn lattice.

Covers the third big data axis of SURVEY.md §5's "shard the big axes"
mandate (rays and voxels shipped in rounds 3-4; tets are the remaining one —
BASELINE config 2 is 12.2M tets on a 128^3 lattice). Built exactly like
:mod:`parallel.marching_cubes`: the SDF lattice is sharded into x-slabs,
each shard exchanges a 2-row halo with its +x neighbour over ICI
(``jax.lax.ppermute``), and vertex/face slots come from a globally
consistent numbering via a distributed prefix scan over all-gathered
per-row counts — no atomics, no cross-shard duplication.

Seam-edge consistency (SURVEY §7 hard part #4: one global id per seam
vertex) falls out of the analytic lattice numbering
(:mod:`ops.marching_tetrahedra` round-5 tier): a crossing edge's id is
``row_offset[p] + in-row rank`` in p-major, delta-ascending direction order
— the same arithmetic on either side of the seam. The delta-ascending order
places the within-row directions (z, y, yz) before the +x ones, and the
2-row halo makes the first foreign row's full 7-bit crossing byte locally
computable, so every id a seam tet references is available on the shard
that emits it.

Sharding is for the LATTICE tier (Kuhn ``grid_tetrahedra`` complexes, the
reference capability at config-2 scale); general tet soups use the
single-chip sort tiers. Fully differentiable wrt the SDF slab (ppermute
transposes to the reverse permute).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..core import debug
from ..ops.marching_cubes import _excl_cumsum_flat, _expand_src
from ..ops.marching_tetrahedra import (_KUHN_PATHS, _LATTICE_DIRS, _TRI_TABLE,
                                       _where_chain)
from .marching_cubes import ShardedMCResult, _row_ids

Array = jax.Array

# field semantics are identical to the sharded-MC result (per-shard padded
# buffers + global bases/counts); reuse the container
ShardedMTResult = ShardedMCResult


def sharded_marching_tetrahedra_lattice(
    mesh: Mesh,
    sdf: Array,
    n: int,
    *,
    vert_cap_per_shard: int,
    face_cap_per_shard: int,
    axis_name: str = "x",
) -> ShardedMTResult:
    """Marching tetrahedra over an x-sharded Kuhn lattice SDF.

    ``sdf`` is the (n, n, n) lattice SDF grid (or its (n^3,) flattening);
    an ``n`` that does not divide the mesh axis size is padded internally
    (edge-row replication with all crossings/cells masked against the true
    row count). Vertex positions use the identity index-space convention
    (scale externally), matching ``marching_tetrahedra_lattice(None, ...)``.
    """
    S = mesh.shape[axis_name]
    sdf = jnp.asarray(sdf, jnp.float32).reshape(n, n, n)
    Xp = -(-n // S) * S
    if Xp != n:
        sdf = jnp.concatenate(
            [sdf, jnp.broadcast_to(sdf[-1:], (Xp - n, n, n))], axis=0)

    impl = functools.partial(
        mt_lattice_shard_body, axis_name=axis_name, S=S, n=n,
        vert_cap_per_shard=vert_cap_per_shard,
        face_cap_per_shard=face_cap_per_shard,
    )
    impl = functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis_name, None, None),),
        out_specs=(
            P(axis_name, None),  # vertices
            P(axis_name, None),  # faces
            P(axis_name),  # vert_base
            P(axis_name),  # face_base
            P(axis_name),  # vert_count
            P(axis_name),  # face_count
        ),
        check_vma=False,  # mixed invariant/varying carries in the scans
    )(impl)
    v, f, vb, fb, vc, fc = jax.jit(impl)(sdf)
    return ShardedMTResult(v, f, vb, fb, vc, fc)


def mt_lattice_shard_body(slab: Array, *, axis_name: str, S: int, n: int,
                          vert_cap_per_shard: int, face_cap_per_shard: int):
    """Per-shard lattice-MT body — the inside of
    :func:`sharded_marching_tetrahedra_lattice`'s shard_map, exposed for
    composition into larger sharded programs. ``slab`` is this shard's
    (Xs, n, n) x-slab of the SDF lattice (point rows
    ``[s * Xs, (s + 1) * Xs)``). Returns per-shard ``(verts, faces,
    vert_base[1], face_base[1], vert_count[1], face_count[1])`` with faces
    carrying globally consistent vertex ids.
    """
    Xs = slab.shape[0]
    N2 = n * n
    s = jax.lax.axis_index(axis_name)

    # --- halo: the next shard's first TWO rows -----------------------------
    # Two rows, not one: owned cells' seam tets reference halo-row vertex
    # ids, whose in-row rank mixes all 7 direction bits of earlier points in
    # that row — the +x bits need row Xs+1.
    first_rows = slab[0:2]
    perm = [(i, (i - 1) % S) for i in range(S)]
    halo = jax.lax.ppermute(first_rows, axis_name, perm)
    halo = jnp.where(s == S - 1,
                     jnp.broadcast_to(slab[-1:], (2, n, n)), halo)
    g = jnp.concatenate([slab, halo], axis=0)  # (Xs + 2, n, n)

    occ = g > 0  # MT convention: occupied iff sdf > 0
    grow = s * Xs + jnp.arange(Xs + 2)  # global point row of local row

    # --- crossing fields for point rows 0..Xs (owned + first halo row) -----
    R = Xs + 1
    cbyte = jnp.zeros((R, n, n), jnp.int32)
    tot = jnp.zeros((R, n, n), jnp.int32)
    deltas = [(dx * n + dy) * n + dz for dx, dy, dz in _LATTICE_DIRS]
    for di, (dx, dy, dz) in enumerate(_LATTICE_DIRS):
        a = occ[0: R, : n - dy, : n - dz]
        b = occ[dx: R + dx, dy:, dz:]
        c = jnp.pad((a != b).astype(jnp.int32),
                    ((0, 0), (0, dy), (0, dz)))
        rows_ok = ((grow[:R] + dx <= n - 1)
                   & (grow[:R] <= n - 1))[:, None, None]
        c = jnp.where(rows_ok, c, 0)
        cbyte = cbyte + (c << di)
        tot = tot + c

    # --- distributed prefix scan over per-row vertex counts ----------------
    rowtot = jnp.sum(tot[:Xs], axis=(1, 2), dtype=jnp.int32)  # owned rows
    rowtot_all = jax.lax.all_gather(rowtot, axis_name, tiled=True)  # (Xp,)
    row_off = jnp.cumsum(rowtot_all) - rowtot_all
    total_v = jnp.sum(rowtot_all)
    Xp = rowtot_all.shape[0]

    off = row_off[jnp.minimum(grow[:R], Xp - 1)]
    off = jnp.where(grow[:R] > n - 1, total_v, off)
    # global exclusive id of each local point (rows 0..Xs): row offset +
    # in-row point-major rank
    excl_pt = off[:, None, None] + _row_ids(tot)  # (R, n, n)
    excl_flat = excl_pt.reshape(-1)
    cbyte_flat = cbyte.reshape(-1)
    tot_flat = tot.reshape(-1)
    g_flat = g.reshape(-1)

    vbase = off[0]
    vcount = jnp.sum(rowtot)

    # --- vertices: slot -> (local point, direction) decode -----------------
    own = Xs * N2
    # slot -> owning point by sort-free rank decoding (``excl_flat - vbase``
    # over the owned rows IS the flat exclusive cumsum of ``tot_flat``:
    # per-row offsets + within-row ranks chain exactly)
    q = jnp.arange(vert_cap_per_shard, dtype=jnp.int32)
    p, r = _expand_src(tot_flat[:own], vert_cap_per_shard)
    cb = cbyte_flat[p]
    di = jnp.zeros_like(r)
    cnt = jnp.zeros_like(r)
    for i in range(7):
        bit = (cb >> i) & 1
        di = jnp.where((cnt == r) & (bit == 1), i, di)
        cnt = cnt + bit
    b_idx = jnp.minimum(p + _where_chain(di, deltas), (Xs + 2) * N2 - 1)
    s_a = g_flat[p]
    s_b = g_flat[b_idx]
    denom = s_a - s_b
    denom = jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
    w_b = s_a / denom
    valid_v = q < vcount
    pi = (p // N2).astype(jnp.float32) + (s * Xs).astype(jnp.float32)
    pj = ((p // n) % n).astype(jnp.float32)
    pk = (p % n).astype(jnp.float32)
    ddx = _where_chain(di, [d[0] for d in _LATTICE_DIRS])
    ddy = _where_chain(di, [d[1] for d in _LATTICE_DIRS])
    ddz = _where_chain(di, [d[2] for d in _LATTICE_DIRS])
    verts = jnp.stack(
        [jnp.where(valid_v, pi + ddx * w_b, 0.0),
         jnp.where(valid_v, pj + ddy * w_b, 0.0),
         jnp.where(valid_v, pk + ddz * w_b, 0.0)], axis=-1)

    # --- faces: per-cell triangle counts (elementwise stencils) ------------
    nm1 = n - 1
    C2 = nm1 * nm1
    occ_c = {}
    for c in range(8):
        dx, dy, dz = (c >> 0) & 1, (c >> 1) & 1, (c >> 2) & 1
        occ_c[c] = occ[dx: Xs + dx, dy: nm1 + dy, dz: nm1 + dz]
    cell_ok = (grow[:Xs] <= n - 2)[:, None, None]
    packed_nt = jnp.zeros((Xs, nm1, nm1), jnp.int32)
    celltot = jnp.zeros((Xs, nm1, nm1), jnp.int32)
    for pth, quad in enumerate(_KUHN_PATHS):
        s4 = sum(occ_c[c].astype(jnp.int32) for c in quad)
        nt = jnp.where((s4 > 0) & (s4 < 4), jnp.where(s4 == 2, 2, 1), 0)
        nt = jnp.where(cell_ok, nt, 0)
        packed_nt = packed_nt + (nt << (2 * pth))
        celltot = celltot + nt

    cellrow = jnp.sum(celltot, axis=(1, 2), dtype=jnp.int32)  # (Xs,)
    cellrow_all = jax.lax.all_gather(cellrow, axis_name, tiled=True)
    frow_off = jnp.cumsum(cellrow_all) - cellrow_all
    total_f = jnp.sum(cellrow_all)
    fbase = frow_off[jnp.minimum(s * Xs, Xp - 1)]
    fbase = jnp.where(s * Xs > Xp - 1, total_f, fbase)
    fcount = jnp.sum(cellrow)

    excl_cell = _row_ids(celltot) + (
        frow_off[jnp.minimum(grow[:Xs], Xp - 1)] - fbase)[:, None, None]
    excl_cell_flat = excl_cell.reshape(-1)
    celltot_flat = celltot.reshape(-1)
    packed_flat = packed_nt.reshape(-1)
    Cn = Xs * C2

    # slot -> owning cell by sort-free rank decoding; ``excl_cell_flat``
    # minus the shard face base is the flat exclusive cumsum of
    # ``celltot_flat`` by the same row-chaining argument as the vertex side
    s_q = jnp.arange(1, face_cap_per_shard + 1, dtype=jnp.int32)
    cell, rr = _expand_src(celltot_flat, face_cap_per_shard)
    w = packed_flat[cell]
    path = jnp.zeros_like(rr)
    kk = jnp.zeros_like(rr)
    cnt = jnp.zeros_like(rr)
    for pth in range(6):
        ntp = (w >> (2 * pth)) & 3
        hit = (rr >= cnt) & (rr < cnt + ntp)
        path = jnp.where(hit, pth, path)
        kk = jnp.where(hit, rr - cnt, kk)
        cnt = cnt + ntp
    valid_f = s_q <= fcount

    ci = cell // C2  # local cell row
    cj = (cell // nm1) % nm1
    ck = cell % nm1
    base_pt = (ci * n + cj) * n + ck  # local slab flat id of corner 0

    def corner_flat(code_per_path):
        code = _where_chain(path, list(code_per_path))
        return (base_pt + ((code & 1) * n + ((code >> 1) & 1)) * n
                + ((code >> 2) & 1))

    p0 = corner_flat([qd[0] for qd in _KUHN_PATHS])
    p1 = corner_flat([qd[1] for qd in _KUHN_PATHS])
    p2 = corner_flat([qd[2] for qd in _KUHN_PATHS])
    p3 = corner_flat([qd[3] for qd in _KUHN_PATHS])
    # identity index-space lattice: all Kuhn tets positively oriented — no
    # per-face det / corner flip needed (matches the single-chip tier)

    occ_flat = occ[: R].reshape(-1)
    o0 = occ_flat[p0].astype(jnp.int32)
    o1 = occ_flat[p1].astype(jnp.int32)
    o2 = occ_flat[p2].astype(jnp.int32)
    o3 = occ_flat[p3].astype(jnp.int32)
    table_idx = o0 + 2 * o1 + 4 * o2 + 8 * o3
    tri_rows = _TRI_TABLE[table_idx]

    ecA = [0, 0, 0, 1, 1, 2]
    ecB = [1, 2, 3, 2, 3, 3]

    def corner_pick(sel):
        return jnp.where(
            sel == 0, p0,
            jnp.where(sel == 1, p1, jnp.where(sel == 2, p2, p3)))

    fcols = []
    for j in range(3):
        ejk = jnp.take_along_axis(
            tri_rows, (3 * kk + j)[:, None], axis=1)[:, 0]
        e = jnp.maximum(ejk, 0)
        pa = corner_pick(_where_chain(e, ecA))
        pb = corner_pick(_where_chain(e, ecB))
        lo = jnp.minimum(pa, pb)
        dflat = jnp.abs(pa - pb)
        dsel = jnp.zeros_like(dflat)
        for i, dv in enumerate(deltas):
            dsel = jnp.where(dflat == dv, i, dsel)
        vid = (excl_flat[lo]
               + jax.lax.population_count(
                   cbyte_flat[lo] & ((1 << dsel) - 1)))
        fcols.append(jnp.where(valid_f, vid, 0))
    faces = jnp.stack(fcols, axis=-1)

    debug.check(
        (vcount <= vert_cap_per_shard) & (fcount <= face_cap_per_shard),
        "mt_lattice_shard_body: per-shard capacity overflow "
        "(shard counted {v} verts / {f} faces)",
        v=vcount, f=fcount,
    )
    return (
        verts,
        faces,
        vbase[None],
        fbase[None],
        vcount[None],
        fcount[None],
    )

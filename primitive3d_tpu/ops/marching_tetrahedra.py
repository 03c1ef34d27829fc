"""Differentiable marching tetrahedra (DMTet-style) in pure JAX.

Covers the reference's ``prim3d.marching_tetrahedras`` (reference:
prim3d/utility/marching_tetrahedras.py:89-235, itself adapted from kaolin's
tetmesh.py) with a TPU-first, jit-compatible design:

  * ``torch.unique`` has no dynamic-shape JAX twin, so edge deduplication is a
    multi-key ``jax.lax.sort`` over the 6T (min,max) vertex pairs followed by
    run-length head detection and two exclusive prefix scans (group ids and
    crossing-vertex slots) — all static shapes.
  * The orientation correction (signed tet volume via a 4x4 determinant,
    reference :50-65) is applied functionally; the input ``tets`` array is
    NOT mutated (the reference flips the caller's tensor in place, :148 — a
    bug we fix rather than port).
  * Vertex positions use the same SDF-weighted edge interpolation
    (reference :175-189) and are differentiable wrt both ``vertices`` and
    ``sdf``; everything discrete is integer-typed or stop-gradient by
    construction.
  * Vertex ordering matches the reference/kaolin exactly (lexicographic over
    sorted edge pairs — ``torch.unique`` sorts too). Face *rows* are ordered
    by tet index (the reference groups all 1-triangle tets before 2-triangle
    tets); parity tests canonicalise.

The 16-entry tables are the standard public marching-tetrahedra tables (same
data as the reference :7-43).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..core import debug
from .marching_cubes import (_excl_cumsum_flat, _expand_src,
                             _masked_compact_cols, _twolevel_src)

Array = jax.Array

# Local tet edges 0..5 connect corners EDGES[e] (reference :33-43).
TET_EDGES = np.array(
    [[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]], dtype=np.int32
)

# TRI_TABLE[mask] -> up to 2 triangles as local-edge ids, -1 padded, where
# mask bit i is set iff sdf[corner i] > 0 (reference :7-27).
MT_TRI_TABLE = np.array(
    [
        [-1, -1, -1, -1, -1, -1],  # 0000
        [1, 0, 2, -1, -1, -1],  # 0001
        [4, 0, 3, -1, -1, -1],  # 0010
        [1, 4, 2, 1, 3, 4],  # 0011
        [3, 1, 5, -1, -1, -1],  # 0100
        [2, 3, 0, 2, 5, 3],  # 0101
        [1, 4, 0, 1, 5, 4],  # 0110
        [4, 2, 5, -1, -1, -1],  # 0111
        [4, 5, 2, -1, -1, -1],  # 1000
        [4, 1, 0, 4, 5, 1],  # 1001
        [3, 2, 0, 3, 5, 2],  # 1010
        [1, 3, 5, -1, -1, -1],  # 1011
        [4, 1, 2, 4, 3, 1],  # 1100
        [3, 0, 4, -1, -1, -1],  # 1101
        [2, 0, 1, -1, -1, -1],  # 1110
        [-1, -1, -1, -1, -1, -1],  # 1111
    ],
    dtype=np.int32,
)
MT_NUM_TRIS = np.array(
    [0, 1, 1, 2, 1, 2, 2, 1, 1, 2, 2, 1, 2, 1, 1, 0], dtype=np.int32
)

_TRI_TABLE = jnp.asarray(MT_TRI_TABLE)
_NUM_TRIS = jnp.asarray(MT_NUM_TRIS)
_TET_EDGES = jnp.asarray(TET_EDGES)


class MTResult(NamedTuple):
    """Padded marching-tetrahedra output (static shapes, jit-friendly)."""

    vertices: Array  # (vert_capacity, 3) float32
    faces: Array  # (face_capacity, 3) int32
    tet_idx: Array  # (face_capacity,) int32, -1 padded
    num_vertices: Array  # () int32
    num_faces: Array  # () int32

    @property
    def overflowed(self) -> Array:
        return (self.num_vertices > self.vertices.shape[0]) | (
            self.num_faces > self.faces.shape[0]
        )


def _oriented_tets(vertices: Array, tets: Array):
    """Corner columns of ``tets`` with negative-signed-volume tets flipped
    (reference :50-65), functionally and in T-major layout.

    The signed volume is the triple product det([b-a, c-a, d-a]) — same sign
    as the reference's 4x4 homogeneous determinant (reference :56-62).
    Returns four (T,) corner-id arrays rather than a (T, 4) array: on TPU a
    (T, 4) intermediate is tiled (8, 128), padding the 4-wide minor dim to
    128 — a 32x memory inflation that OOMs at the 12M-tet config-2 scale.
    Everything here is 1-D gathers + elementwise ops.
    """
    vg = jax.lax.stop_gradient(vertices)
    x, y, z = vg[:, 0], vg[:, 1], vg[:, 2]
    t0, t1, t2, t3 = (tets[:, c] for c in range(4))

    def e(tc):
        return x[tc] - x[t0], y[tc] - y[t0], z[tc] - z[t0]

    e1x, e1y, e1z = e(t1)
    e2x, e2y, e2z = e(t2)
    e3x, e3y, e3z = e(t3)
    dets = ((e1y * e2z - e1z * e2y) * e3x
            + (e1z * e2x - e1x * e2z) * e3y
            + (e1x * e2y - e1y * e2x) * e3z)
    neg = dets < 0
    # flip corners 0 and 1 (reference convention)
    c0 = jnp.where(neg, t1, t0)
    c1 = jnp.where(neg, t0, t1)
    return c0, c1, t2, t3


_DENSE_MAX_TETS = 500_000  # layout tier boundary (see _mt_padded_impl)


def _mt_impl_dense(
    vertices: Array,
    tets: Array,
    sdf: Array,
    vert_capacity: int,
    face_capacity: int,
) -> MTResult:
    N = vertices.shape[0]
    T = tets.shape[0]
    E = 6 * T

    c0, c1, c2_, c3 = _oriented_tets(vertices, tets)
    tets = jnp.stack([c0, c1, c2_, c3], axis=-1)

    occ = sdf > 0  # (N,)
    occ4 = occ[tets]  # (T, 4)
    occ_sum = jnp.sum(occ4, axis=-1)
    valid_tet = (occ_sum > 0) & (occ_sum < 4)  # (T,)

    # --- edge list: (min, max) vertex pairs; invalid tets -> (N, N) sentinel
    ev = tets[:, _TET_EDGES]  # (T, 6, 2)
    ea = jnp.minimum(ev[..., 0], ev[..., 1])
    eb = jnp.maximum(ev[..., 0], ev[..., 1])
    ea = jnp.where(valid_tet[:, None], ea, N).reshape(E)
    eb = jnp.where(valid_tet[:, None], eb, N).reshape(E)

    # --- dedup via lexicographic sort + run-length heads (torch.unique analog)
    orig_idx = jnp.arange(E, dtype=jnp.int32)
    sa, sb, sidx = jax.lax.sort((ea, eb, orig_idx), num_keys=2)
    head = jnp.concatenate(
        [
            jnp.ones((1,), bool),
            (sa[1:] != sa[:-1]) | (sb[1:] != sb[:-1]),
        ]
    )
    valid_e = sa < N  # sentinel pairs excluded

    occ_ext = jnp.concatenate([occ, jnp.zeros((1,), bool)])
    crossing = occ_ext[jnp.minimum(sa, N)] != occ_ext[jnp.minimum(sb, N)]
    is_new_vertex = head & valid_e & crossing

    # vertex slot for each unique crossing edge (exclusive scan over heads)
    inv = is_new_vertex.astype(jnp.int32)
    vslot = jnp.cumsum(inv) - inv  # (E,) valid at head positions
    num_vertices = jnp.sum(inv)

    # propagate the head's vertex id (or -1) to every duplicate in its group:
    # an entry's group head is the first position sharing its inclusive head
    # count — one binary search + gather (TPU scatters lower to serial loops,
    # so scatter-based propagation is avoided throughout).
    h_incl = jnp.cumsum(head.astype(jnp.int32))  # (E,) inclusive
    head_pos = jnp.searchsorted(h_incl, h_incl, method="sort")
    head_vid = jnp.where(is_new_vertex, vslot, -1)
    vid_sorted = head_vid[jnp.clip(head_pos, 0, E - 1)]

    # back to original (tet, local-edge) layout: invert the permutation with
    # a second sort (parallel-friendly) instead of a scatter
    _, edge_vid_flat = jax.lax.sort((sidx, vid_sorted), num_keys=1)
    edge_vid = edge_vid_flat.reshape(T, 6)

    # --- vertex positions: sdf-weighted lerp on unique crossing edges --------
    a_idx = jnp.minimum(sa, N - 1)
    b_idx = jnp.minimum(sb, N - 1)
    s_a = sdf[a_idx]
    s_b = sdf[b_idx]
    denom = s_a - s_b
    denom = jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
    w_a = -s_b / denom
    w_b = s_a / denom
    pos = vertices[a_idx] * w_a[:, None] + vertices[b_idx] * w_b[:, None]

    vmask = is_new_vertex.astype(jnp.int32)
    verts = _masked_compact_cols(pos.T, vmask, vslot, vert_capacity).T

    # --- faces ---------------------------------------------------------------
    table_idx = jnp.sum(
        occ4.astype(jnp.int32) * jnp.asarray([1, 2, 4, 8], jnp.int32), axis=-1
    )  # (T,)
    ntris = jnp.where(valid_tet, _NUM_TRIS[table_idx], 0)
    num_faces = jnp.sum(ntris)

    # gather-based face emission (same pattern as marching cubes): face slot
    # s -> owning tet by sort-free rank decoding over the per-tet triangle
    # counts (round 5; rounds 1-4 ran a merge-sort ``searchsorted`` over
    # face_capacity + T keys here)
    s_q = jnp.arange(1, face_capacity + 1, dtype=jnp.int32)
    tet_g, k = _expand_src(ntris, face_capacity)
    k = jnp.clip(k, 0, 1)  # out-of-range slots decode to garbage ranks
    valid_f = s_q <= num_faces
    tri_rows = _TRI_TABLE[table_idx[tet_g]]  # (Fc, 6)
    ev_rows = edge_vid[tet_g]  # (Fc, 6)
    fcols = []
    for j in range(3):
        ejk = jnp.take_along_axis(tri_rows, (3 * k + j)[:, None], axis=1)[:, 0]
        vid = jnp.take_along_axis(
            ev_rows, jnp.maximum(ejk, 0)[:, None], axis=1
        )[:, 0]
        fcols.append(jnp.where(valid_f, vid, 0))
    faces = jnp.stack(fcols, axis=-1)
    tet_of_face = jnp.where(valid_f, tet_g, -1)

    return MTResult(verts, faces, tet_of_face, num_vertices, num_faces)



@functools.partial(jax.jit, static_argnames=("vert_capacity", "face_capacity"))
def _mt_padded_impl(vertices, tets, sdf, vert_capacity, face_capacity):
    """Static-shape marching tetrahedra core — two layout tiers.

    Below _DENSE_MAX_TETS the r1-r3 dense formulation ((T, 4) corner
    arrays, tet-major edge space) is fastest (6.7 ms at 12k tets; the
    T-major form costs ~3 ms more in extra small gathers). Past it the
    T-major + active-compaction form below is the only one that FITS:
    dense (T, k) intermediates tile to (8, 128) on TPU, padding tiny
    minor dims 32x (19-50 GB at 12M tets), and the full-edge-space
    sorts cost 15.6 s against 833 ms compacted."""
    if tets.shape[0] <= _DENSE_MAX_TETS:
        return _mt_impl_dense(vertices, tets, sdf, vert_capacity,
                              face_capacity)
    return _mt_impl_tmajor(vertices, tets, sdf, vert_capacity,
                           face_capacity)


def _mt_impl_tmajor(
    vertices: Array,
    tets: Array,
    sdf: Array,
    vert_capacity: int,
    face_capacity: int,
) -> MTResult:
    """T-major / active-compacted marching tetrahedra core.

    Two scale disciplines (the 12M-tet config-2 lessons):

    * LAYOUT: every per-tet / per-edge intermediate is a 1-D (T,)/(E,)
      array or a small-major (k, T) stack — never (T, k) with k tiny,
      whose TPU (8, 128) tiling pads the minor dim to 128 (32x memory).
      The flat edge space is EDGE-MAJOR (e * A + t).
    * SPARSITY: only ~1-2% of a volume's tets cross the isosurface, and
      every crossing edge belongs to a crossing tet — so ACTIVE tets are
      compacted first (same two-level unit selection as marching cubes,
      exact-bound capacity = face_capacity since each active tet emits
      >= 1 triangle) and the sort-based edge dedup runs over 6 * active
      instead of 6 * T edges (a ~40x sort-size cut at 128^3: the full-E
      formulation measured 15.6 s/call, dominated by 74M-element sorts).
      The surviving crossing-edge set — and therefore the reference-parity
      vertex order — is identical by construction.
    """
    N = vertices.shape[0]
    T = tets.shape[0]
    # active-tet capacity: exact bound (each active tet emits >= 1
    # triangle), clamped to T — when face_capacity >= T the compaction
    # cannot shrink the edge space and is skipped entirely (it REGRESSED
    # the 12k-tet case 2.2x before this clamp: 6*face_capacity > 6*T)
    A = min(face_capacity, T)
    E = 6 * A

    # --- per-tet occupancy (1-D gathers only) -------------------------------
    occ = sdf > 0  # (N,)
    tcols = [tets[:, c] for c in range(4)]
    occ_t = [occ[c] for c in tcols]  # four (T,) bools
    occ_sum = sum(o.astype(jnp.int32) for o in occ_t)
    valid_tet = (occ_sum > 0) & (occ_sum < 4)  # (T,)
    # triangles per tet without a table gather: 2 for two-in/two-out
    # configurations, 1 otherwise (0 for inactive)
    ntris_full = jnp.where(
        valid_tet, jnp.where(occ_sum == 2, 2, 1), 0)
    num_faces = jnp.sum(ntris_full)

    # --- compact active tets (order-preserving two-level selection) ---------
    if A < T:
        amask = valid_tet.astype(jnp.int8)
        asrc, _ = _twolevel_src(amask, A, A)  # (A,) ascending active ids
        n_active = jnp.sum(amask, dtype=jnp.int32)
        act_valid = jnp.arange(A, dtype=jnp.int32) < n_active  # (A,)
        tcols_a = [c[asrc] for c in tcols]
    else:
        # nothing to shrink: identity "compaction", invalid tets masked by
        # the sentinel directly (the original formulation)
        asrc = jnp.arange(T, dtype=jnp.int32)
        act_valid = valid_tet
        tcols_a = tcols
    corners = _oriented_tets(
        vertices, jnp.stack(tcols_a, axis=-1))  # 4 x (A,)
    occ_a = [occ[c] for c in corners]

    # --- edge list: (min, max) vertex pairs; invalid slots -> (N, N) --------
    # edge-major stacks (6, A) -> flat (E,) with index e * A + t
    ea6 = jnp.stack(
        [jnp.minimum(corners[a], corners[b]) for a, b in TET_EDGES], axis=0)
    eb6 = jnp.stack(
        [jnp.maximum(corners[a], corners[b]) for a, b in TET_EDGES], axis=0)
    ea = jnp.where(act_valid[None, :], ea6, N).reshape(E)
    eb = jnp.where(act_valid[None, :], eb6, N).reshape(E)

    # --- dedup via lexicographic sort + run-length heads (torch.unique analog)
    orig_idx = jnp.arange(E, dtype=jnp.int32)
    sa, sb, sidx = jax.lax.sort((ea, eb, orig_idx), num_keys=2)
    head = jnp.concatenate(
        [
            jnp.ones((1,), bool),
            (sa[1:] != sa[:-1]) | (sb[1:] != sb[:-1]),
        ]
    )
    valid_e = sa < N  # sentinel pairs excluded

    occ_ext = jnp.concatenate([occ, jnp.zeros((1,), bool)])
    crossing = occ_ext[jnp.minimum(sa, N)] != occ_ext[jnp.minimum(sb, N)]
    is_new_vertex = head & valid_e & crossing

    # vertex slot for each unique crossing edge (exclusive scan over heads)
    inv = is_new_vertex.astype(jnp.int32)
    vslot = jnp.cumsum(inv) - inv  # (E,) valid at head positions
    num_vertices = jnp.sum(inv)

    # propagate the head's vertex id (or -1) to every duplicate in its group:
    # an entry's group head is the first position sharing its inclusive head
    # count — one binary search + gather (TPU scatters lower to serial loops,
    # so scatter-based propagation is avoided throughout).
    h_incl = jnp.cumsum(head.astype(jnp.int32))  # (E,) inclusive
    head_pos = jnp.searchsorted(h_incl, h_incl, method="sort")
    head_vid = jnp.where(is_new_vertex, vslot, -1)
    vid_sorted = head_vid[jnp.clip(head_pos, 0, E - 1)]

    # back to original edge-major layout: invert the permutation with a
    # second sort (parallel-friendly) instead of a scatter
    _, edge_vid_flat = jax.lax.sort((sidx, vid_sorted), num_keys=1)  # (E,)

    # --- vertex positions: sdf-weighted lerp on unique crossing edges --------
    a_idx = jnp.minimum(sa, N - 1)
    b_idx = jnp.minimum(sb, N - 1)
    s_a = sdf[a_idx]
    s_b = sdf[b_idx]
    denom = s_a - s_b
    denom = jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
    w_a = -s_b / denom
    w_b = s_a / denom
    # component-major (3, E): vertices[a_idx] as an (E, 3) value would tile
    # to (E, 128)
    pos_c = jnp.stack(
        [vertices[:, c][a_idx] * w_a + vertices[:, c][b_idx] * w_b
         for c in range(3)], axis=0)

    vmask = is_new_vertex.astype(jnp.int32)
    verts = _masked_compact_cols(pos_c, vmask, vslot, vert_capacity).T

    # --- faces (compacted-tet space) ----------------------------------------
    table_idx = (occ_a[0].astype(jnp.int32) + 2 * occ_a[1]
                 + 4 * occ_a[2] + 8 * occ_a[3])  # (A,)
    ntris = jnp.where(act_valid, _NUM_TRIS[table_idx], 0)
    incl = jnp.cumsum(ntris)  # inclusive scan: only incl[A-1] is consumed

    # gather-based face emission (same pattern as marching cubes): face slot
    # s -> owning active tet by sort-free rank decoding (round 5; rounds
    # 1-4 ran a merge-sort ``searchsorted`` over face_capacity + A keys)
    s_q = jnp.arange(1, face_capacity + 1, dtype=jnp.int32)
    tet_a, k = _expand_src(ntris, face_capacity)
    # clip keeps within-capacity slots well-formed when active tets exceed A
    # (overflow is already flagged via num_faces; without the clip k escapes
    # the 0/1 range and emits garbage ids in otherwise-valid slots)
    k = jnp.clip(k, 0, 1)
    valid_f = (s_q <= num_faces) & (s_q <= incl[A - 1])
    tri_rows = _TRI_TABLE[table_idx[tet_a]]  # (Fc, 6) — Fc-major, small
    fcols = []
    for j in range(3):
        ejk = jnp.take_along_axis(tri_rows, (3 * k + j)[:, None], axis=1)[:, 0]
        # edge-major flat lookup: vid of local edge e of active tet t
        vid = edge_vid_flat[jnp.maximum(ejk, 0) * A + tet_a]
        fcols.append(jnp.where(valid_f, vid, 0))
    faces = jnp.stack(fcols, axis=-1)
    tet_of_face = jnp.where(valid_f, asrc[tet_a], -1)

    return MTResult(verts, faces, tet_of_face, num_vertices, num_faces)


def marching_tetrahedra_padded(
    vertices,
    tets,
    sdf,
    *,
    vert_capacity: int,
    face_capacity: int,
) -> MTResult:
    """Jittable, differentiable marching tetrahedra with padded outputs.

    Capacity bounds: at most ``6 * num_tets`` vertices (in practice far fewer:
    unique crossing edges) and ``2 * num_tets`` faces.
    """
    vertices = jnp.asarray(vertices, jnp.float32)
    tets = jnp.asarray(tets, jnp.int32)
    sdf = jnp.asarray(sdf, jnp.float32)
    if vertices.ndim != 2 or vertices.shape[-1] != 3:
        raise ValueError(f"vertices must be (N, 3), got {vertices.shape}")
    if tets.ndim != 2 or tets.shape[-1] != 4:
        raise ValueError(f"tets must be (T, 4), got {tets.shape}")
    if sdf.shape != (vertices.shape[0],):
        raise ValueError(f"sdf must be (N,), got {sdf.shape}")
    debug.check(
        jnp.all((tets >= 0) & (tets < vertices.shape[0])),
        "marching_tetrahedra: tet vertex index out of range",
    )
    debug.check_finite(sdf, "sdf")
    return _mt_padded_impl(
        vertices, tets, sdf, int(vert_capacity), int(face_capacity)
    )


def marching_tetrahedra(
    vertices,
    tets,
    sdf,
    return_tet_idx: bool = False,
) -> Union[Tuple[Array, Array], Tuple[Array, Array, Array]]:
    """Eager marching tetrahedra: exact-size (vertices, faces[, tet_idx]).

    API mirrors the reference (reference :89-235); differentiable through the
    returned vertices. ``tets`` is not mutated.
    """
    tets = jnp.asarray(tets, jnp.int32)
    T = tets.shape[0]
    res = marching_tetrahedra_padded(
        vertices, tets, sdf, vert_capacity=6 * T, face_capacity=2 * T
    )
    nv, nf = int(res.num_vertices), int(res.num_faces)
    if return_tet_idx:
        return res.vertices[:nv], res.faces[:nf], res.tet_idx[:nf]
    return res.vertices[:nv], res.faces[:nf]


# ---------------------------------------------------------------------------
# Lattice tier: analytic edge numbering for Kuhn 6-tet grids (no sorts).
# ---------------------------------------------------------------------------
# Unique edges of the Kuhn complex over an (n, n, n) vertex lattice fall in
# exactly 7 direction classes (the nonzero 0/1 offset vectors); every
# in-range (point, direction) segment is an edge of some cell's tet, and
# every tet edge is such a segment (each edge's endpoint difference is
# single-signed, so the flat-min endpoint is the componentwise min). The
# reference-parity vertex order — lexicographic on (min_id, max_id) vertex
# pairs, i.e. torch.unique order — is therefore p-major with directions in
# ascending flat-id-delta order: z, y, yz, x, xz, xy, xyz. Listed here as
# (dx, dy, dz) in that order; deltas (dx*n + dy)*n + dz are strictly
# ascending for every n >= 2.
_LATTICE_DIRS = (
    (0, 0, 1), (0, 1, 0), (0, 1, 1), (1, 0, 0),
    (1, 0, 1), (1, 1, 0), (1, 1, 1),
)
# Kuhn 6-tet paths around the (0 -> 7) cell diagonal, matching
# grid_tetrahedra's emission order (tet index t = cell * 6 + path).
_KUHN_PATHS = ((0, 1, 3, 7), (0, 3, 2, 7), (0, 2, 6, 7),
               (0, 6, 4, 7), (0, 4, 5, 7), (0, 5, 1, 7))


def _where_chain(sel: Array, values) -> Array:
    """values[sel] for a short static list, as a select chain (no gather)."""
    out = jnp.full_like(sel, values[0])
    for i in range(1, len(values)):
        out = jnp.where(sel == i, values[i], out)
    return out


def _lattice_fields(occ3: Array, n: int):
    """Direction-major crossing structure of an (n, n, n) occupancy grid.

    Returns ``(cbyte, tot, excl_pt)``: per-point packed 7-bit crossing byte
    (bit di set iff the edge from p in direction ``_LATTICE_DIRS[di]`` is in
    range and sign-crossing), per-point crossing totals, and the exclusive
    prefix scan of those totals in p-major order. The global id of crossing
    edge (p, di) is ``excl_pt[p] + popcount(cbyte[p] & ((1 << di) - 1))`` —
    the analytic replacement for the sort tier's torch.unique analog.
    """
    N = n * n * n
    cbyte = jnp.zeros((N,), jnp.int32)
    tot = jnp.zeros((N,), jnp.int32)
    for di, (dx, dy, dz) in enumerate(_LATTICE_DIRS):
        a = occ3[: n - dx, : n - dy, : n - dz]
        b = occ3[dx:, dy:, dz:]
        c = jnp.pad((a != b).astype(jnp.int32),
                    ((0, dx), (0, dy), (0, dz))).reshape(N)
        cbyte = cbyte + (c << di)
        tot = tot + c
    excl_pt = _excl_cumsum_flat(tot)
    return cbyte, tot, excl_pt


def _mt_impl_lattice(
    vertices,  # (n^3, 3) float32 or None (identity index-space lattice)
    sdf: Array,
    n: int,
    vert_capacity: int,
    face_capacity: int,
) -> MTResult:
    """Marching tetrahedra over the Kuhn lattice — zero sorts.

    Output-identical to the sort tiers on ``grid_tetrahedra(n)`` inputs
    (vertex order, face order, windings, tet_idx — asserted in
    tests/test_marching_tetrahedra.py), but every per-edge structure is
    computed analytically from the lattice: crossing masks are shifted-XOR
    stencils, vertex ids are a single prefix scan in p-major order, and the
    only sort-shaped work left is two merge-``searchsorted`` calls sizing
    with n^3, not 6T. Differentiable wrt ``vertices`` and ``sdf``.
    """
    N = n * n * n
    if sdf.shape != (N,):
        raise ValueError(f"sdf must be ({N},) for lattice n={n}, "
                         f"got {sdf.shape}")
    occ3 = (sdf > 0).reshape(n, n, n)
    cbyte, tot, excl_pt = _lattice_fields(occ3, n)
    incl_pt = excl_pt + tot
    num_vertices = incl_pt[N - 1]
    deltas = [(dx * n + dy) * n + dz for dx, dy, dz in _LATTICE_DIRS]

    # --- vertices: slot -> (point, direction) decode ------------------------
    q = jnp.arange(vert_capacity, dtype=jnp.int32)
    p = jnp.clip(jnp.searchsorted(incl_pt, q + 1, method="sort"), 0, N - 1)
    r = q - excl_pt[p]  # rank within the point's crossing byte
    cb = cbyte[p]
    di = jnp.zeros_like(r)
    cnt = jnp.zeros_like(r)
    for i in range(7):
        bit = (cb >> i) & 1
        di = jnp.where((cnt == r) & (bit == 1), i, di)
        cnt = cnt + bit
    b_idx = p + _where_chain(di, deltas)
    b_idx = jnp.minimum(b_idx, N - 1)
    s_a = sdf[p]
    s_b = sdf[b_idx]
    denom = s_a - s_b
    denom = jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
    w_a = -s_b / denom
    w_b = s_a / denom
    valid_v = q < num_vertices
    if vertices is None:
        # identity lattice positions: decode p/b to coordinates (no gathers)
        pi = (p // (n * n)).astype(jnp.float32)
        pj = ((p // n) % n).astype(jnp.float32)
        pk = (p % n).astype(jnp.float32)
        ddx = _where_chain(di, [d[0] for d in _LATTICE_DIRS])
        ddy = _where_chain(di, [d[1] for d in _LATTICE_DIRS])
        ddz = _where_chain(di, [d[2] for d in _LATTICE_DIRS])
        cols = [pi + ddx * w_b, pj + ddy * w_b, pk + ddz * w_b]
    else:
        cols = [vertices[:, c][p] * w_a + vertices[:, c][b_idx] * w_b
                for c in range(3)]
    verts = jnp.stack(
        [jnp.where(valid_v, c, 0.0) for c in cols], axis=-1)

    # --- faces: per-cell triangle counts (elementwise stencils) -------------
    C = (n - 1) ** 3
    occ_c = {}
    for c in range(8):
        dx, dy, dz = (c >> 0) & 1, (c >> 1) & 1, (c >> 2) & 1
        occ_c[c] = occ3[dx: n - 1 + dx, dy: n - 1 + dy, dz: n - 1 + dz]
    nt_p = []
    packed_nt = jnp.zeros((C,), jnp.int32)
    celltot = jnp.zeros((C,), jnp.int32)
    for pth, quad in enumerate(_KUHN_PATHS):
        s4 = sum(occ_c[c].astype(jnp.int32) for c in quad).reshape(C)
        nt = jnp.where((s4 > 0) & (s4 < 4), jnp.where(s4 == 2, 2, 1), 0)
        nt_p.append(nt)
        packed_nt = packed_nt + (nt << (2 * pth))
        celltot = celltot + nt
    excl_cell = _excl_cumsum_flat(celltot)
    incl_cell = excl_cell + celltot
    num_faces = incl_cell[C - 1]

    s_q = jnp.arange(1, face_capacity + 1, dtype=jnp.int32)
    cell = jnp.clip(
        jnp.searchsorted(incl_cell, s_q, method="sort"), 0, C - 1)
    rr = (s_q - 1) - excl_cell[cell]
    w = packed_nt[cell]
    path = jnp.zeros_like(rr)
    kk = jnp.zeros_like(rr)
    cnt = jnp.zeros_like(rr)
    for pth in range(6):
        ntp = (w >> (2 * pth)) & 3
        hit = (rr >= cnt) & (rr < cnt + ntp)
        path = jnp.where(hit, pth, path)
        kk = jnp.where(hit, rr - cnt, kk)
        cnt = cnt + ntp
    valid_f = s_q <= num_faces

    # corner flat ids of the face's tet (analytic from cell + path)
    nm1 = n - 1
    ci = cell // (nm1 * nm1)
    cj = (cell // nm1) % nm1
    ck = cell % nm1
    base_pt = (ci * n + cj) * n + ck

    def corner_flat(code_per_path):
        code = _where_chain(path, list(code_per_path))
        return (base_pt + ((code & 1) * n + ((code >> 1) & 1)) * n
                + ((code >> 2) & 1))

    p0 = corner_flat([q[0] for q in _KUHN_PATHS])  # always corner 0
    p1 = corner_flat([q[1] for q in _KUHN_PATHS])
    p2 = corner_flat([q[2] for q in _KUHN_PATHS])
    p3 = corner_flat([q[3] for q in _KUHN_PATHS])  # always corner 7

    # orientation flip from TRUE positions (deformed lattices can invert
    # cells; index-space Kuhn tets are all positive — verified analytically)
    if vertices is None:
        neg = jnp.zeros(p0.shape, bool)
    else:
        vg = jax.lax.stop_gradient(vertices)

        def comp(idx):
            return vg[:, 0][idx], vg[:, 1][idx], vg[:, 2][idx]

        ax_, ay_, az_ = comp(p0)
        e1 = tuple(u - v for u, v in zip(comp(p1), (ax_, ay_, az_)))
        e2 = tuple(u - v for u, v in zip(comp(p2), (ax_, ay_, az_)))
        e3 = tuple(u - v for u, v in zip(comp(p3), (ax_, ay_, az_)))
        dets = ((e1[1] * e2[2] - e1[2] * e2[1]) * e3[0]
                + (e1[2] * e2[0] - e1[0] * e2[2]) * e3[1]
                + (e1[0] * e2[1] - e1[1] * e2[0]) * e3[2])
        neg = dets < 0
    cc0 = jnp.where(neg, p1, p0)
    cc1 = jnp.where(neg, p0, p1)

    occ_flat = occ3.reshape(N)
    o0 = occ_flat[cc0].astype(jnp.int32)
    o1 = occ_flat[cc1].astype(jnp.int32)
    o2 = occ_flat[p2].astype(jnp.int32)
    o3 = occ_flat[p3].astype(jnp.int32)
    table_idx = o0 + 2 * o1 + 4 * o2 + 8 * o3
    tri_rows = _TRI_TABLE[table_idx]  # (Fc, 6)

    # local edge -> global crossing-edge id (analytic, 2 gathers per edge)
    ecA = [0, 0, 0, 1, 1, 2]  # TET_EDGES first corners
    ecB = [1, 2, 3, 2, 3, 3]

    def corner_pick(sel):
        return jnp.where(
            sel == 0, cc0,
            jnp.where(sel == 1, cc1, jnp.where(sel == 2, p2, p3)))

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
        vid = (excl_pt[lo]
               + jax.lax.population_count(
                   cbyte[lo] & ((1 << dsel) - 1)))
        fcols.append(jnp.where(valid_f, vid, 0))
    faces = jnp.stack(fcols, axis=-1)
    tet_of_face = jnp.where(valid_f, cell * 6 + path, -1)

    return MTResult(verts, faces, tet_of_face, num_vertices, num_faces)


@functools.partial(
    jax.jit, static_argnames=("n", "vert_capacity", "face_capacity",
                              "identity_positions"))
def _mt_lattice_jit(vertices, sdf, n, vert_capacity, face_capacity,
                    identity_positions):
    return _mt_impl_lattice(
        None if identity_positions else vertices, sdf, n,
        vert_capacity, face_capacity)


def marching_tetrahedra_lattice(
    vertices,
    sdf,
    n: int,
    *,
    vert_capacity: int,
    face_capacity: int,
) -> MTResult:
    """Marching tetrahedra over the Kuhn 6-tet lattice — the sort-free tier.

    Drop-in for ``marching_tetrahedra_padded(vertices,
    grid_tetrahedra(n)[1], sdf, ...)`` when the tet mesh IS the Kuhn
    lattice (DMTet-style grids, BASELINE config 2): output-identical to
    the general tiers (same vertex/face order, windings, tet_idx) but with
    zero sorts — edge identity is analytic, so the 6T-element dedup sorts
    disappear and runtime scales with n^3 stencils instead. ``vertices``
    may be ``None`` for the undeformed index-space lattice (positions are
    then decoded, not gathered). Differentiable wrt ``vertices`` and
    ``sdf``. General tet meshes must use
    :func:`marching_tetrahedra_padded`.
    """
    sdf = jnp.asarray(sdf, jnp.float32)
    ident = vertices is None
    if ident:
        varr = jnp.zeros((1, 3), jnp.float32)  # placeholder operand
    else:
        varr = jnp.asarray(vertices, jnp.float32)
        if varr.shape != (n * n * n, 3):
            raise ValueError(
                f"vertices must be ({n**3}, 3) for lattice n={n}, "
                f"got {varr.shape}")
    debug.check_finite(sdf, "sdf")
    return _mt_lattice_jit(varr, sdf, n, int(vert_capacity),
                           int(face_capacity), ident)


def grid_tetrahedra(n: int):
    """Kuhn 6-tetrahedra split of an (n, n, n) vertex lattice.

    BASELINE.md config 2 is marching tetrahedra over a 128^3 sphere SDF —
    the reference example ships a small precomputed tet file; this builds
    the full-scale input: vertices are the n^3 lattice points (index
    space), and every cell [i,i+1]x[j,j+1]x[k,k+1] splits into the six
    tetrahedra along its main diagonal (0,7): (0,1,3,7), (0,3,2,7),
    (0,2,6,7), (0,6,4,7), (0,4,5,7), (0,5,1,7) with corner c at offset
    ((c>>0)&1, (c>>1)&1, (c>>2)&1). Adjacent cells share the diagonal
    direction, so faces are consistent across cells. Returns
    ``(points (n^3, 3) float32, tets (6*(n-1)^3, 4) int32)``.
    """
    ax = np.arange(n, dtype=np.float32)
    pts = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"), -1).reshape(-1, 3)
    i, j, k = np.meshgrid(np.arange(n - 1), np.arange(n - 1),
                          np.arange(n - 1), indexing="ij")
    base = (i * n + j) * n + k  # corner 0 of each cell, flat id
    base = base.reshape(-1)

    def corner(c):
        dx, dy, dz = (c >> 0) & 1, (c >> 1) & 1, (c >> 2) & 1
        return base + (dx * n + dy) * n + dz

    paths = [(0, 1, 3, 7), (0, 3, 2, 7), (0, 2, 6, 7),
             (0, 6, 4, 7), (0, 4, 5, 7), (0, 5, 1, 7)]
    tets = np.stack(
        [np.stack([corner(c) for c in quad], axis=-1) for quad in paths],
        axis=1,
    ).reshape(-1, 4).astype(np.int32)
    return pts, tets

"""TPU-native marching cubes on dense density grids (pure XLA, differentiable).

Covers the reference's CUDA marching cubes (reference:
src/prim3d/Utility/marching_cubes.cu:4-305 — three kernels: count /
gen_vertices / gen_faces with atomicAdd slot allocation and a host counter
readback between passes) with a TPU-first design:

  * **No atomics, no dynamic shapes.** Vertex/face slots are assigned by an
    exclusive ``jnp.cumsum`` prefix scan over deterministic axis-major edge
    order, and results are scattered into static-capacity padded buffers.
    The whole pipeline is a single ``jit``-compatible, fusable XLA program —
    no device→host sync between passes (the reference syncs at
    marching_cubes.cu:251-252).
  * **Deterministic output order** (the reference's atomics are not).
  * **Differentiable**: vertex positions are smooth functions of the density
    samples through the edge-interpolation weight
    ``dt = (thresh - d0) / (d1 - d0)`` (reference: marching_cubes.cu:105), and
    gradients flow through the scatter. The reference's CUDA MC is *not*
    differentiable; this one is.
  * **Consistent bbox convention** ``world = index * (upper-lower)/res + lower``
    (the reference's GPU path has a copy-paste bug mixing bbox components,
    marching_cubes.cu:293-297, and its CPU path divides where the GPU path
    multiplies; we fix rather than port — see module docs in core/grid.py).

Vertex ordering: all x-axis crossing vertices in C-order of the (X-1,Y,Z) edge
grid, then y-axis, then z-axis. Face ordering: C-order over cubes, up to 5
triangles per cube (table order).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..core import debug
from ..core.grid import ScaleLike, resolve_bounds
from . import mc_tables as T

Array = jax.Array

# (16, 256) layout: gathering columns by cube mask yields (16, C) with the
# huge cube dimension trailing — the natural TPU tiling. A (C, 16) layout pads
# the 16-wide minor dim to 128 lanes (8x memory blowup at 256^3).
_TRI_TABLE_T = jnp.asarray(T.TRI_TABLE.astype(np.int32).T)
_NUM_TRIS = jnp.asarray(T.NUM_TRIS)  # (256,)
# flat (256*5,) packed per-triangle edge info (see mc_tables.PACKED_TRI)
_PACKED_TRI_FLAT = jnp.asarray(T.PACKED_TRI.reshape(-1))
MAX_TRIS_PER_CUBE = T.MAX_TRIS_PER_CUBE

# NUM_TRIS values are 3 bits; pack bit b of all 256 entries into eight
# 32-bit words so the per-cube triangle count is computable with pure vector
# ops (selects + shifts) — a grid-sized dynamic gather from the table costs
# ~150 ms at 256^3 on TPU, this costs ~2 ms.
_NT_BITWORDS = np.zeros((3, 8), np.uint32)
for _m in range(256):
    for _b in range(3):
        if (int(T.NUM_TRIS[_m]) >> _b) & 1:
            _NT_BITWORDS[_b, _m // 32] |= np.uint32(1 << (_m % 32))


def _ntris_vec(mask: Array) -> Array:
    """Per-cube triangle count NUM_TRIS[mask] without a dynamic gather."""
    hi = (mask >> 5).astype(jnp.int32)  # word index, 0..7
    lo = (mask & 31).astype(jnp.uint32)  # bit index
    out = jnp.zeros(mask.shape, jnp.int32)
    for b in range(3):
        w = jnp.full(mask.shape, _NT_BITWORDS[b, 0], jnp.uint32)
        for i in range(1, 8):
            w = jnp.where(hi == i, jnp.uint32(_NT_BITWORDS[b, i]), w)
        bit = ((w >> lo) & 1).astype(jnp.int32)
        out = out + (bit << b)
    return out


def _excl_cumsum_flat(x: Array, block: int = 128) -> Array:
    """Exclusive prefix sum of a flat int array via MXU triangular matmul.

    The FLOPs of a prefix scan belong on the systolic array: within each
    block, ``excl = x_block @ StrictUpper`` (exact in f32 — per-block sums
    stay < 2^24 for every caller: crossing masks are 0/1 and triangle
    counts are <= 5); the inter-block offsets come from a scan over the
    per-block totals. A direct 1-D ``jnp.cumsum`` over tens of millions of
    elements lowers poorly on TPU.

    Matmul FLOPs are ``2 * n * block``, so the smallest MXU-shaped block
    (128) is 4x cheaper than round-4's 512 — the scans were ~15% of the
    256^3 extraction. When there are too many blocks for a flat inter-block
    ``jnp.cumsum`` to lower well, the totals scan RECURSES through this
    same routine; totals can exceed the f32-exact budget there, so the
    recursive level scans 12-bit digit planes separately (cumsum is linear:
    ``excl(t) = excl(t >> 12) * 4096 + excl(t & 0xFFF)``) — exact int32 up
    to 2^31 totals.
    """
    n = x.shape[0]
    pad = (-n) % block
    xp = jnp.concatenate([x, jnp.zeros((pad,), x.dtype)]).reshape(-1, block)
    xf = xp.astype(jnp.float32)
    strict_upper = jnp.triu(jnp.ones((block, block), jnp.float32), k=1)
    intra_excl = jax.lax.dot_general(
        xf,
        strict_upper,
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    totals = jnp.sum(xp, axis=1).astype(jnp.int32)
    if totals.shape[0] > 8192:
        hi = _excl_cumsum_flat(totals >> 12, block)
        lo = _excl_cumsum_flat(totals & 0xFFF, block)
        offsets = (hi * 4096 + lo).astype(x.dtype)
    else:
        offsets = (jnp.cumsum(totals) - totals).astype(x.dtype)
    return (intra_excl + offsets[:, None]).reshape(-1)[:n]


class MCResult(NamedTuple):
    """Padded marching-cubes output (static shapes, jit-friendly).

    ``vertices[:num_vertices]`` and ``faces[:num_faces]`` are valid; the tail is
    zero padding. ``num_*`` may exceed the capacity if the buffers overflowed —
    check ``overflowed`` before trusting a padded result.
    """

    vertices: Array  # (vert_capacity, 3) float32
    faces: Array  # (face_capacity, 3) int32
    num_vertices: Array  # () int32  (true count, may exceed capacity)
    num_faces: Array  # () int32
    unit_overflow: Array = False  # two-level compaction ran out of units

    @property
    def overflowed(self) -> Array:
        return (
            (self.num_vertices > self.vertices.shape[0])
            | (self.num_faces > self.faces.shape[0])
            | jnp.asarray(self.unit_overflow)
        )


_UNIT = 128  # elements per unit of the two-level compaction


def _unit_view(mask: Array):
    """(U, _UNIT) zero-padded view of a flat mask + per-unit counts."""
    E = mask.shape[0]
    U = -(-E // _UNIT)
    m2 = jnp.concatenate(
        [mask, jnp.zeros((U * _UNIT - E,), mask.dtype)]
    ).reshape(U, _UNIT)
    ucnt = jnp.sum(m2, axis=1, dtype=jnp.int32)
    return m2, ucnt


def _pack_units(m2: Array) -> Array:
    """(U, 4) int32 bit-packed view of a (U, 128) 0/1 unit mask.

    Word k of a unit holds elements [32k, 32k+32) as bits (LSB first)."""
    U = m2.shape[0]
    m32 = m2.reshape(U * 4, 32).astype(jnp.int32)
    w = jnp.arange(32, dtype=jnp.int32)[None, :]
    return jnp.sum(m32 << w, axis=1, dtype=jnp.int32).reshape(U, 4)


_SUP = 32  # items per super-group of the sort-free expansion decode


def _expand_src(counts: Array, capacity: int):
    """Slot -> (item, rank) decode for variable-count expansion — sort-free.

    Item ``i`` with count ``c_i`` owns output slots ``[excl_i, excl_i+c_i)``
    (``excl`` the exclusive prefix of counts); this returns, for every slot
    ``q`` in ``[0, capacity)``, the owning item and ``q``'s rank within it.
    Rounds 1-4 answered slot->item with a merge-sort ``searchsorted`` whose
    cost is a sort of ``capacity + N`` keys — the single biggest remaining
    sort in MC/MT. This replaces it with dense-domain rank decoding:

      (1) items group into supers of 32 whose within-super inclusive counts
          come from one tiny row cumsum;
      (2) each super marks its global END slot with a scatter-add of ONE
          int per super (N/32 elements — the only scatter, ~100x smaller
          than the old sort); an inclusive prefix scan of the marks over
          the dense slot axis IS slot -> super ("how many supers ended at
          or before me");
      (3) the super's exclusive offset + its 32 inclusive counts ride one
          (capacity, 33) row gather; two vector compares finish item and
          rank.

    Slots past the true total decode to in-bounds garbage (mask on the
    caller's validity count, exactly like the searchsorted path did).
    """
    n = counts.shape[0]
    counts = counts.astype(jnp.int32)
    pad = (-n) % _SUP
    cp = jnp.pad(counts, (0, pad)) if pad else counts
    c2 = cp.reshape(-1, _SUP)  # (S, 32) per-item counts
    incl_w = jnp.cumsum(c2, axis=1)  # within-super inclusive counts
    scnt = incl_w[:, -1]  # (S,) per-super totals
    S = c2.shape[0]
    excl_s = _excl_cumsum_flat(scnt)
    incl_s = excl_s + scnt
    # (2): sup(q) = #supers whose inclusive end is <= q
    marks = jnp.zeros((capacity,), jnp.int32).at[
        jnp.clip(incl_s, 0, capacity - 1)
    ].add((incl_s < capacity).astype(jnp.int32))
    sup = jnp.minimum(_excl_cumsum_flat(marks) + marks, S - 1)
    q = jnp.arange(capacity, dtype=jnp.int32)
    table = jnp.concatenate([excl_s[:, None], incl_w], axis=1)  # (S, 33)
    g = table[sup]  # ONE row gather per slot
    r_s = q - g[:, 0]  # rank within the super
    iw = g[:, 1:]  # (capacity, 32) within-super inclusive counts
    # item within super = #items of the super fully before rank r_s; rank
    # within item = r_s minus the items-before inclusive count (which is
    # iw[uidx-1], extracted with an iota compare — no second gather)
    uidx = jnp.sum((iw <= r_s[:, None]).astype(jnp.int32), axis=1)
    uidx = jnp.minimum(uidx, _SUP - 1)
    j = jax.lax.broadcasted_iota(jnp.int32, iw.shape, 1)
    pre = jnp.sum(jnp.where(j == uidx[:, None] - 1, iw, 0), axis=1)
    item = jnp.minimum(sup * _SUP + uidx, n - 1)
    return item, r_s - pre


def _twolevel_src(mask: Array, capacity: int, unit_capacity: int,
                  m2=None, ucnt=None):
    """Stable selection: indices of the first ``capacity`` set bits — EXACT.

    A single stable sort over tens of millions of mask elements dominates MC
    runtime at 256^3+ (rounds 1-3 replaced it with a three-sort two-level
    unit scheme; round 5 replaces the sorts with rank DECODING). The mask is
    viewed as 128-element units whose per-unit counts are already known:

      (1) ``_expand_src`` over the U = E/128 per-unit counts answers
          slot -> (unit, within-unit rank) with NO sort at all (boundary
          scatter + dense prefix scan — see its docstring; earlier round-5
          code ran a merge-sort ``searchsorted`` over capacity + U keys
          here, the last sort-shaped work in the op);
      (2) the rank decodes to a bit position by popcount-prefix over the
          unit's 4 bit-packed words, fetched with one (capacity, 4) row
          gather (word -> byte -> bit, all static vector ops).

    Unlike the old unit-budget scheme this never truncates: selection is
    exact for any occupancy, so ``unit_overflow`` is constant False (kept in
    the signature for callers; ``unit_capacity`` is accepted and ignored).
    """
    del unit_capacity  # the decode is exact; no unit budget exists any more
    if m2 is None:
        m2, ucnt = _unit_view(mask)
    packed = _pack_units(m2)  # (U, 4) int32 — one elementwise pass over E
    unit, r = _expand_src(ucnt, capacity)
    # ONE row gather per slot: a (capacity, 4) row gather costs about the
    # same as a single-element gather per row on TPU — a round-5 probe that
    # split the row into per-word computed-index gathers (plus a packed
    # popcount-prefix byte) measured 50% SLOWER (18.4 vs 12.1 ms at
    # flagship scale); gather OPS are the budget, not gathered elements.
    w = packed[unit]  # (capacity, 4)
    pc = jax.lax.population_count(w)
    c1 = pc[:, 0]
    c2 = c1 + pc[:, 1]
    c3 = c2 + pc[:, 2]
    widx = ((r >= c1).astype(jnp.int32) + (r >= c2) + (r >= c3))
    word = jnp.where(
        widx == 0, w[:, 0],
        jnp.where(widx == 1, w[:, 1], jnp.where(widx == 2, w[:, 2], w[:, 3])))
    r = r - jnp.where(
        widx == 0, 0, jnp.where(widx == 1, c1, jnp.where(widx == 2, c2, c3)))
    # byte level within the 32-bit word
    b = jnp.stack([(word >> (8 * i)) & 0xFF for i in range(4)], axis=-1)
    bp = jax.lax.population_count(b)
    d1 = bp[:, 0]
    d2 = d1 + bp[:, 1]
    d3 = d2 + bp[:, 2]
    bidx = ((r >= d1).astype(jnp.int32) + (r >= d2) + (r >= d3))
    byte = jnp.where(
        bidx == 0, b[:, 0],
        jnp.where(bidx == 1, b[:, 1], jnp.where(bidx == 2, b[:, 2], b[:, 3])))
    r = r - jnp.where(
        bidx == 0, 0, jnp.where(bidx == 1, d1, jnp.where(bidx == 2, d2, d3)))
    # bit level: 8 static steps find the r-th set bit of the byte
    pos = jnp.zeros_like(r)
    cnt = jnp.zeros_like(r)
    for i in range(8):
        bit = (byte >> i) & 1
        pos = jnp.where((cnt == r) & (bit == 1), i, pos)
        cnt = cnt + bit
    src = unit * _UNIT + widx * 32 + bidx * 8 + pos
    return src, jnp.bool_(False)


def _units_occupied(mask: Array) -> Array:
    """Number of 128-element units containing any set bit (overflow check)."""
    _, ucnt = _unit_view(mask)
    return jnp.sum(ucnt > 0, dtype=jnp.int32)


def _default_unit_capacity(capacity: int, E: int) -> int:
    """Default units budget: the EXACT bound ``capacity`` — the first
    ``capacity`` selected elements span at most ``capacity`` occupied units
    (each holds >= 1), so the default can never truncate. Callers chasing
    the last 20-30% of MC throughput pass a tight measured budget instead
    (see bench.py / marching_cubes, which derive it from the counts pass).

    History: an earlier heuristic assumed >= 8 crossings per occupied
    128-unit; a 256^3 sphere averages 1.5 and silently lost the +x
    hemisphere of the flagship mesh (round-3 fix)."""
    U = -(-E // _UNIT)
    return min(U, max(4096, capacity))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _masked_compact_cols(
    vals: Array,
    mask: Array,
    excl_ids: Array,
    capacity: int,
    unit_capacity: int = 0,
):
    """Stable stream compaction of column-stacked values, gathers both ways.

    ``vals`` is (K, E); forward: ``out[:, s] = vals[:, i_s]`` where ``i_s`` is
    the s-th index with ``mask`` set (order preserving); zeros past the
    selected count. TPU scatters lower to serial per-element loops, so the
    classic scatter-at-scan-slot compaction is replaced by a stable sort on
    the selection mask (~20x faster than binary-search compaction on TPU;
    the sort is shared by all K columns). ``unit_capacity > 0`` switches to
    the two-level scheme (:func:`_twolevel_src`) that sorts only occupied
    128-element units — the right choice for huge sparse masks. The VJP
    exploits the bijection between selected inputs and output slots, so the
    backward pass is ALSO a gather: ``dvals[:, i] = mask[i] * g[:, excl_ids[i]]``.
    """
    out, _ = _masked_compact_cols_fwd(vals, mask, excl_ids, capacity,
                                      unit_capacity)
    return out


def _masked_compact_cols_fwd(vals, mask, excl_ids, capacity, unit_capacity=0):
    E = vals.shape[-1]
    if unit_capacity:
        src, _ = _twolevel_src(mask, capacity, unit_capacity)
        k = capacity
    else:
        idx = jnp.arange(E, dtype=jnp.int32)
        _, src_all = jax.lax.sort((1 - mask, idx), num_keys=1, is_stable=True)
        k = min(capacity, E)
        src = src_all[:k]
    total = excl_ids[-1] + mask[-1]
    q = jnp.arange(k, dtype=jnp.int32)
    out = jnp.where(q[None, :] < total, vals[:, src], 0)
    if k < capacity:
        out = jnp.concatenate(
            [out, jnp.zeros((vals.shape[0], capacity - k), vals.dtype)],
            axis=-1,
        )
    return out, (mask, excl_ids)


def _masked_compact_cols_bwd(capacity, unit_capacity, res, g):
    mask, excl_ids = res
    slot = jnp.clip(excl_ids, 0, capacity - 1)
    in_range = (excl_ids < capacity) & (mask > 0)
    dvals = jnp.where(in_range[None, :], g[:, slot], 0)
    return dvals, None, None


_masked_compact_cols.defvjp(_masked_compact_cols_fwd, _masked_compact_cols_bwd)


def _masked_compact(vals: Array, mask: Array, excl_ids: Array, capacity: int):
    """Single-column convenience wrapper over :func:`_masked_compact_cols`."""
    return _masked_compact_cols(vals[None, :], mask, excl_ids, capacity)[0]


def _decode_edge(src: Array, shape) -> Tuple[Array, ...]:
    """Decode global edge ids (x-block, then y, then z; C-order each) into
    axis flags, lattice coords (i, j, k) and density-flat endpoint indices."""
    X, Y, Z = shape
    Ex = (X - 1) * Y * Z
    Ey = X * (Y - 1) * Z
    is_x = src < Ex
    is_y = (src >= Ex) & (src < Ex + Ey)
    is_z = ~(is_x | is_y)
    lx, ly, lz = src, src - Ex, src - Ex - Ey

    def ijk(l, d1, d2):
        return l // d1, (l % d1) // d2, l % d2

    xi, xj, xk = ijk(lx, Y * Z, Z)
    yi, yj, yk = ijk(ly, (Y - 1) * Z, Z)
    zi, zj, zk = ijk(lz, Y * (Z - 1), Z - 1)

    def pick(a, b, c):
        return jnp.where(is_x, a, jnp.where(is_y, b, c))

    i = pick(xi, yi, zi)
    j = pick(xj, yj, zj)
    k = pick(xk, yk, zk)
    p0 = i * (Y * Z) + j * Z + k
    p1 = p0 + pick(Y * Z, Z, 1)
    return is_x, is_y, is_z, i, j, k, p0, p1


@jax.custom_vjp
def _selected_positions(density, thresh, src, valid, scale, lower):
    """World positions of the selected crossing edges — sparse.

    The dense formulation materialises interpolation weights and three
    coordinate grids for ALL edges (~600 MB at 256^3) and then gathers the
    few selected ones. This computes everything at the ``capacity`` selected
    edges only: decode the edge id, gather its two density samples, and
    interpolate. The VJP is hand-written to match the dense path's gradient
    exactly (including the where-guarded zero-denominator branch), with a
    small scatter-add back into the density grid.
    """
    out, _ = _selected_positions_fwd(density, thresh, src, valid, scale,
                                     lower)
    return out


def _selected_positions_fwd(density, thresh, src, valid, scale, lower):
    is_x, is_y, is_z, i, j, k, p0, p1 = _decode_edge(src, density.shape)
    dflat = density.reshape(-1)
    d0 = dflat[p0]
    d1 = dflat[p1]
    den = d1 - d0
    safe = jnp.where(den == 0, jnp.float32(1), den)
    dtr = (thresh - d0) / safe
    dt = jnp.clip(dtr, 0.0, 1.0)
    fi = i.astype(jnp.float32)
    fj = j.astype(jnp.float32)
    fk = k.astype(jnp.float32)
    coords = [
        fi + jnp.where(is_x, dt, 0.0),
        fj + jnp.where(is_y, dt, 0.0),
        fk + jnp.where(is_z, dt, 0.0),
    ]
    out = jnp.stack([coords[a] * scale[a] + lower[a] for a in range(3)])
    out = jnp.where(valid[None, :], out, 0.0)
    res = (density.shape, thresh, src, valid, scale, d0, d1)
    return out, res


def _selected_positions_bwd(res, g):
    shape, thresh, src, valid, scale, d0, d1 = res
    is_x, is_y, is_z, i, j, k, p0, p1 = _decode_edge(src, shape)
    g = jnp.where(valid[None, :], g, 0.0)
    den = d1 - d0
    safe = jnp.where(den == 0, jnp.float32(1), den)
    dtr = (thresh - d0) / safe
    dt = jnp.clip(dtr, 0.0, 1.0)
    fi = i.astype(jnp.float32)
    fj = j.astype(jnp.float32)
    fk = k.astype(jnp.float32)
    coords = [
        fi + jnp.where(is_x, dt, 0.0),
        fj + jnp.where(is_y, dt, 0.0),
        fk + jnp.where(is_z, dt, 0.0),
    ]
    dscale = jnp.stack([jnp.sum(g[a] * coords[a]) for a in range(3)])
    dlower = jnp.stack([jnp.sum(g[a]) for a in range(3)])
    ddt = (
        g[0] * jnp.where(is_x, scale[0], 0.0)
        + g[1] * jnp.where(is_y, scale[1], 0.0)
        + g[2] * jnp.where(is_z, scale[2], 0.0)
    )
    inside = (dtr >= 0.0) & (dtr <= 1.0)  # clip passes grad on the boundary
    ddtr = jnp.where(inside, ddt, 0.0)
    zero = den == 0
    dd0 = ddtr * jnp.where(zero, -1.0, (dtr - 1.0) / safe)
    dd1 = ddtr * jnp.where(zero, 0.0, -dtr / safe)
    dthresh = jnp.sum(ddtr / safe)
    n = shape[0] * shape[1] * shape[2]
    dflat = (
        jnp.zeros((n,), jnp.float32).at[p0].add(dd0).at[p1].add(dd1)
    )
    return dflat.reshape(shape), dthresh, None, None, dscale, dlower


_selected_positions.defvjp(_selected_positions_fwd, _selected_positions_bwd)


def _crossing_masks(occ: Array) -> Tuple[Array, Array, Array]:
    """Edge sign-change masks along x/y/z (reference: marching_cubes.cu:29-45)."""
    cx = occ[:-1, :, :] != occ[1:, :, :]
    cy = occ[:, :-1, :] != occ[:, 1:, :]
    cz = occ[:, :, :-1] != occ[:, :, 1:]
    return cx, cy, cz


def _cube_mask(occ: Array) -> Array:
    """Per-cube 8-bit corner mask (reference: marching_cubes.cu:49-57)."""
    m = occ[:-1, :-1, :-1] * 1
    m = m + occ[1:, :-1, :-1] * 2
    m = m + occ[1:, 1:, :-1] * 4
    m = m + occ[:-1, 1:, :-1] * 8
    m = m + occ[:-1, :-1, 1:] * 16
    m = m + occ[1:, :-1, 1:] * 32
    m = m + occ[1:, 1:, 1:] * 64
    m = m + occ[:-1, 1:, 1:] * 128
    return m


@functools.partial(jax.jit, static_argnames=("thresh_is_dynamic",))
def _counts_impl(density: Array, thresh: Array, thresh_is_dynamic: bool = True):
    occ = density > thresh
    cx, cy, cz = _crossing_masks(occ)
    nv = (
        jnp.sum(cx, dtype=jnp.int32)
        + jnp.sum(cy, dtype=jnp.int32)
        + jnp.sum(cz, dtype=jnp.int32)
    )
    ntris = _ntris_vec(_cube_mask(occ.astype(jnp.int32)))
    nf = jnp.sum(ntris, dtype=jnp.int32)
    # occupied 128-unit counts: lets the eager path size the two-level
    # compaction exactly (no heuristic, no overflow)
    mask_flat = jnp.concatenate(
        [c.reshape(-1) for c in (cx, cy, cz)]
    ).astype(jnp.int8)
    vunits = _units_occupied(mask_flat)
    cunits = _units_occupied((ntris > 0).astype(jnp.int8).reshape(-1))
    n_active = jnp.sum(ntris > 0, dtype=jnp.int32)
    return nv, nf, vunits, cunits, n_active


def marching_cubes_counts(
    density: Array, thresh: Union[float, Array]
) -> Tuple[Array, Array]:
    """Jittable (num_vertices, num_faces) for capacity sizing.

    TPU-native analog of the reference's count pass
    (marching_cubes.cu:4-68) — but usable without a host sync.
    """
    density = jnp.asarray(density, jnp.float32)
    return _counts_impl(density, jnp.float32(thresh))[:2]


def _edge_ids(cx, cy, cz):
    """Global exclusive-scan vertex ids per axis: x-axis vertices first
    (C-order), then y, then z — a deterministic replacement for the
    reference's atomicAdd slot allocation (marching_cubes.cu:104,117,130)."""
    nx = jnp.sum(cx, dtype=jnp.int32)
    ny = jnp.sum(cy, dtype=jnp.int32)

    def excl_ids(c):
        return _excl_cumsum_flat(c.reshape(-1).astype(jnp.int32))

    ids_x = excl_ids(cx)
    ids_y = excl_ids(cy) + nx
    ids_z = excl_ids(cz) + nx + ny
    return ids_x, ids_y, ids_z


def _edge_vertex_data(density: Array, thresh: Array, occ: Array):
    """Per-axis crossing masks and exclusive-scan vertex ids (XLA path)."""
    cx, cy, cz = _crossing_masks(occ)
    return (cx, cy, cz), _edge_ids(cx, cy, cz)


@functools.partial(
    jax.jit,
    static_argnames=(
        "vert_capacity", "face_capacity", "vert_units", "cube_units",
        "fused_masks_mode", "active_capacity",
    ),
)
def _mc_padded_impl(
    density: Array,
    thresh: Array,
    lower: Array,
    upper: Array,
    vert_capacity: int,
    face_capacity: int,
    vert_units: int = 0,
    cube_units: int = 0,
    fused_masks_mode: int = 0,  # 0: XLA stencils, 1: fused Pallas kernel
    active_capacity: int = 0,  # 0: face_capacity (always safe)
) -> MCResult:
    X, Y, Z = density.shape
    if fused_masks_mode:
        from ..kernels.mc_masks import fused_masks

        cx, cy, cz, cmask = fused_masks(
            jax.lax.stop_gradient(density), thresh
        )
    else:
        occ = density > thresh
        cx, cy, cz = _crossing_masks(occ)
        cmask = None

    # --- vertices: two-level selection + sparse positions --------------------
    # Select the crossing-edge ids (two-level, sorts only occupied units),
    # then compute interpolated world positions at the selected edges only —
    # no dense interpolation-weight or coordinate grids (see
    # _selected_positions).
    scale = (upper - lower) / jnp.asarray([X, Y, Z], jnp.float32)
    mask_flat = jnp.concatenate(
        [c.reshape(-1) for c in (cx, cy, cz)]
    ).astype(jnp.int8)
    # ONE exclusive scan over the concatenated crossing mask doubles as the
    # global vertex numbering for all three axes (x-edges first, then y, z —
    # exactly the compaction order), so the face pass needs a single id
    # gather instead of three per-axis ones.
    ids_all = _excl_cumsum_flat(mask_flat.astype(jnp.int32))
    E = mask_flat.shape[0]
    m2v, ucnt_v = _unit_view(mask_flat)  # shared: counts + compaction
    num_vertices = jnp.sum(ucnt_v)
    del vert_units  # selection is exact since round 5; no unit budget
    src, _ = _twolevel_src(mask_flat, vert_capacity, 0, m2=m2v, ucnt=ucnt_v)
    valid_slots = (
        jnp.arange(vert_capacity, dtype=jnp.int32) < num_vertices
    )
    verts = _selected_positions(
        density, thresh, src, valid_slots, scale, lower
    ).T

    # --- faces ---------------------------------------------------------------
    if cmask is None:
        cmask = _cube_mask((density > thresh).astype(jnp.uint8))
    mask = cmask.reshape(-1).astype(jnp.int32)  # (C,)
    ntris = _ntris_vec(mask)  # (C,) — vector ops, no grid-sized gather
    num_faces = jnp.sum(ntris)

    # Active-cube face emission: only ~1% of cubes emit triangles, so first
    # compact the active cube indices (two-level, cheap), then do the
    # slot->cube binary search over the compacted array — its sort-based
    # searchsorted merges face_capacity + active-cube elements instead of
    # the full 16M-cube grid. active <= num_faces <= face_capacity, so
    # face_capacity is a safe default active-cube budget; a measured
    # ``active_capacity`` (counts pass) roughly halves the compaction sorts
    # (a cube averages 2-3 triangles).
    del cube_units  # selection is exact since round 5; no unit budget
    amask = (ntris > 0).astype(jnp.int8)
    Ac = active_capacity or face_capacity
    m2c, ucnt_c = _unit_view(amask)
    asrc, _ = _twolevel_src(amask, Ac, 0, m2=m2c, ucnt=ucnt_c)
    n_active = jnp.sum(ucnt_c)
    a_ovf = n_active > Ac
    valid_a = jnp.arange(Ac, dtype=jnp.int32) < n_active
    ntris_a = jnp.where(valid_a, ntris[asrc], 0)  # (Ac,)

    # Face slot s -> (active cube, within-cube triangle k) is sort-free
    # rank decoding over the per-cube triangle counts (``_expand_src``;
    # round 4 ran a merge-sort ``searchsorted`` over face_capacity + Ac
    # elements here — 9.3 of the 44.6 ms 256^3 extraction). Vertex ids come
    # from the bit-packed per-triangle table (mc_tables.PACKED_TRI): one
    # word per slot encodes its 3 vertices' (axis, voxel-offset) — the id
    # is then a COMPUTED flat index into the edge-scan id array. Grid-sized
    # dynamic gathers run at ~9 ns/element on TPU regardless of table size,
    # so per-slot gather count is the budget: the cube id and cube mask
    # ride ONE row gather, with the cube mask pre-gathered once at
    # active-cube granularity instead of per slot from the 16M grid.
    mask_a = jnp.where(valid_a, mask[asrc], 0)  # (Ac,)
    apos, k = _expand_src(ntris_a, face_capacity)
    s_q = jnp.arange(1, face_capacity + 1, dtype=jnp.int32)
    rowA = jnp.stack([asrc, mask_a], axis=1)  # (Ac, 2)
    rw = rowA[apos]  # (Fc, 2)
    cube = rw[:, 0]
    valid_f = s_q <= num_faces
    CY, CZ = Y - 1, Z - 1
    ci = cube // (CY * CZ)
    cj = (cube // CZ) % CY
    ck = cube % CZ
    pk = _PACKED_TRI_FLAT[rw[:, 1] * T.MAX_TRIS_PER_CUBE
                          + jnp.clip(k, 0, T.MAX_TRIS_PER_CUBE - 1)]
    base_x = (ci * Y + cj) * Z + ck  # x-edge block: (X-1, Y, Z)
    base_y = (ci * (Y - 1) + cj) * Z + ck  # y-edge block: (X, Y-1, Z)
    base_z = (ci * Y + cj) * (Z - 1) + ck  # z-edge block: (X, Y, Z-1)
    Ex = (X - 1) * Y * Z
    Ey = X * (Y - 1) * Z
    fcols = []
    for j in range(3):
        info = (pk >> (5 * j)) & 31
        ax = info >> 3
        ox = (info >> 2) & 1
        oy = (info >> 1) & 1
        oz = info & 1
        fx = base_x + oy * Z + oz
        fy = base_y + ox * ((Y - 1) * Z) + oz
        fz = base_z + ox * (Y * (Z - 1)) + oy * (Z - 1)
        gidx = jnp.where(
            ax == 0, fx, jnp.where(ax == 1, Ex + fy, Ex + Ey + fz)
        )
        fcols.append(jnp.where(valid_f, ids_all[gidx], 0))
    faces = jnp.stack(fcols, axis=-1)

    return MCResult(verts, faces, num_vertices, num_faces, a_ovf)


def _corner_gather(density: Array, ci: Array, cj: Array, ck: Array) -> Array:
    """(A, 8) corner densities of cubes (ci, cj, ck), at A granularity.

    Eight flat single-element gathers (one per corner) — deliberately NOT
    an XLA gather with slice_sizes (2, 2, 2): the windowed gather (and its
    windowed scatter-add transpose) lowers to a SERIAL per-index loop on
    TPU — measured 478 ms forward / 1.4 s backward at flagship scale
    versus ~10 ms for this form (round-5 trap). Gathering at ACTIVE-CUBE
    granularity (~Ac rows) instead of per face slot is still the win: the
    per-slot path re-reads each cube's corners for every triangle.
    Differentiable (8 flat scatter-add transposes). Flat order: corner
    (dx, dy, dz) at index dx*4 + dy*2 + dz."""
    _, Y, Z = density.shape
    dflat = density.reshape(-1)
    base = (ci * Y + cj) * Z + ck
    cols = []
    for c in range(8):
        dx, dy, dz = (c >> 2) & 1, (c >> 1) & 1, c & 1
        cols.append(dflat[base + (dx * Y + dy) * Z + dz])
    return jnp.stack(cols, axis=-1)


@jax.custom_vjp
def _slot_rows(cd8: Array, apos: Array, base_a: Array, ntris_a: Array):
    """``cd8[apos]`` with a windowed-segment-sum backward.

    ``apos`` is the face-slot -> active-cube map produced by the
    searchsorted over the triangle-count scan: slots for active cube ``a``
    are exactly ``[base_a[a], base_a[a] + ntris_a[a])`` and
    ``ntris_a <= MAX_TRIS_PER_CUBE``. The generic transpose of this gather
    is an XLA scatter-add over all face slots (~30 ms at flagship scale);
    the windowed backward instead sums each cube's <= 5 consecutive
    cotangent rows with 5 masked row gathers — exact f32 sums, no scatter.
    """
    return cd8[apos]


def _slot_rows_fwd(cd8, apos, base_a, ntris_a):
    return cd8[apos], (cd8.shape[0], base_a, ntris_a)


def _slot_rows_bwd(res, g):
    A, base_a, ntris_a = res
    F = g.shape[0]
    dcd8 = jnp.zeros((A,) + g.shape[1:], g.dtype)
    for t in range(T.MAX_TRIS_PER_CUBE):
        idx = jnp.clip(base_a + t, 0, F - 1)
        dcd8 = dcd8 + jnp.where((t < ntris_a)[:, None], g[idx], 0.0)
    f0 = lambda a: np.zeros(a.shape, dtype=jax.dtypes.float0)  # noqa: E731
    return dcd8, f0(base_a), f0(base_a), f0(ntris_a)


_slot_rows.defvjp(_slot_rows_fwd, _slot_rows_bwd)


def _select8(rows: Array, code: Array) -> Array:
    """rows[:, code] per row, as a static 8-way select chain (no gather)."""
    out = rows[:, 0]
    for i in range(1, 8):
        out = jnp.where(code == i, rows[:, i], out)
    return out


class MCSoupResult(NamedTuple):
    """Padded triangle-soup marching cubes output (static shapes).

    ``soup[:num_faces]`` are world-space triangles; the tail is zero padding
    (degenerate point triangles — guaranteed misses for the casters)."""

    soup: Array  # (face_capacity, 3, 3) float32
    num_faces: Array  # () int32 (true count, may exceed capacity)
    active_overflow: Array = False

    @property
    def overflowed(self) -> Array:
        return (self.num_faces > self.soup.shape[0]) | jnp.asarray(
            self.active_overflow)


@functools.partial(
    jax.jit,
    static_argnames=("face_capacity", "fused_masks_mode", "active_capacity",
                     "x_total"),
)
def _mc_soup_impl(
    density: Array,
    thresh: Array,
    lower: Array,
    upper: Array,
    face_capacity: int,
    fused_masks_mode: int = 0,
    active_capacity: int = 0,
    row_limit: Optional[Array] = None,
    x_offset: Optional[Array] = None,
    x_total: int = 0,
) -> MCSoupResult:
    """Triangle-soup marching cubes: positions emitted AT the face pass.

    The flagship render pipeline consumes ``vertices[faces]`` — an indexed
    mesh is the wrong intermediate for it: the de-index gather costs ~19 ms
    forward and ~20 ms in its scatter transpose at 256^3, and the entire
    vertex numbering/compaction machinery (the concatenated-edge-mask
    prefix scan + selection + sparse positions) exists only to build ids
    the de-index immediately consumes. This op skips ALL of it: each face
    slot decodes its 3 edges' lattice endpoints directly from the cube
    coordinates + packed triangle table and interpolates the crossing
    positions from 2 density gathers per edge. Gradients flow through
    those gathers (their transpose is a coherent scatter-add into the
    grid). Use :func:`marching_cubes_padded` when an indexed mesh is
    actually needed (IO, deduplicated vertices).

    Shard-window mode (``parallel/pipeline.py``): when ``density`` is an
    x-slab of a larger grid (plus one halo row), ``row_limit`` masks cube
    rows at/after the shard's owned range end, ``x_offset`` is the slab's
    global first x index (positions come out in GLOBAL world space), and
    ``x_total`` the full grid's x extent (sets the world scale). A soup
    needs no vertex numbering, so x-slab sharding needs no distributed
    scans at all — only the 1-row halo.
    """
    X, Y, Z = density.shape
    if fused_masks_mode:
        from ..kernels.mc_masks import fused_masks

        _, _, _, cmask = fused_masks(jax.lax.stop_gradient(density), thresh)
    else:
        cmask = _cube_mask((density > thresh).astype(jnp.uint8))
    if row_limit is not None:
        rows_ok = (jnp.arange(X - 1, dtype=jnp.int32)
                   < row_limit)[:, None, None]
        cmask = cmask * rows_ok.astype(cmask.dtype)
    Xg = x_total or X
    xoff = jnp.int32(0) if x_offset is None else x_offset.astype(jnp.int32)
    scale = (upper - lower) / jnp.asarray([Xg, Y, Z], jnp.float32)

    mask = cmask.reshape(-1).astype(jnp.int32)  # (C,)
    ntris = _ntris_vec(mask)
    num_faces = jnp.sum(ntris)

    amask = (ntris > 0).astype(jnp.int8)
    Ac = active_capacity or face_capacity
    m2c, ucnt_c = _unit_view(amask)
    asrc, _ = _twolevel_src(amask, Ac, 0, m2=m2c, ucnt=ucnt_c)
    n_active = jnp.sum(ucnt_c)
    a_ovf = n_active > Ac
    valid_a = jnp.arange(Ac, dtype=jnp.int32) < n_active
    ntris_a = jnp.where(valid_a, ntris[asrc], 0)
    # base_a feeds _slot_rows' windowed-segment backward only — the
    # forward slot -> cube map is sort-free rank decoding, as in
    # _mc_padded_impl (round 5: replaces the merge-sort searchsorted)
    base_a = _excl_cumsum_flat(ntris_a)

    mask_a = jnp.where(valid_a, mask[asrc], 0)  # (Ac,)
    apos, k = _expand_src(ntris_a, face_capacity)
    s_q = jnp.arange(1, face_capacity + 1, dtype=jnp.int32)
    rowA = jnp.stack([asrc, mask_a], axis=1)  # (Ac, 2)
    rw = rowA[apos]
    cube = rw[:, 0]
    valid_f = s_q <= num_faces
    CY, CZ = Y - 1, Z - 1
    ci = cube // (CY * CZ)
    cj = (cube // CZ) % CY
    ck = cube % CZ
    pk = _PACKED_TRI_FLAT[rw[:, 1] * T.MAX_TRIS_PER_CUBE
                          + jnp.clip(k, 0, T.MAX_TRIS_PER_CUBE - 1)]
    # corner densities: ONE 2x2x2 block gather at active-cube granularity,
    # then ONE row gather per face slot (windowed-segment-sum backward);
    # every edge endpoint is one of the cube's 8 corners, picked below by a
    # static select chain — zero per-slot density gathers remain
    ci_a = asrc // (CY * CZ)
    cj_a = (asrc // CZ) % CY
    ck_a = asrc % CZ
    cd = _corner_gather(density, ci_a, cj_a, ck_a)  # (Ac, 8)
    cd8 = _slot_rows(cd, apos, base_a, ntris_a)  # (Fc, 8)
    corners = []
    for j in range(3):
        info = (pk >> (5 * j)) & 31
        ax = info >> 3
        ox = (info >> 2) & 1
        oy = (info >> 1) & 1
        oz = info & 1
        # edge lattice coords: x-edges at (ci, cj+oy, ck+oz), y-edges at
        # (ci+ox, cj, ck+oz), z-edges at (ci+ox, cj+oy, ck) — identical to
        # _decode_edge's convention; endpoint corner codes index the
        # gathered 2x2x2 block (corner (dx,dy,dz) at dx*4 + dy*2 + dz)
        dx0 = jnp.where(ax == 0, 0, ox)
        dy0 = jnp.where(ax == 1, 0, oy)
        dz0 = jnp.where(ax == 2, 0, oz)
        code0 = dx0 * 4 + dy0 * 2 + dz0
        code1 = code0 + jnp.where(ax == 0, 4, jnp.where(ax == 1, 2, 1))
        d0 = _select8(cd8, code0)
        d1 = _select8(cd8, code1)
        ei = ci + xoff + dx0  # global x (xoff = 0 in single-grid mode)
        ej = cj + dy0
        ek = ck + dz0
        den = d1 - d0
        safe = jnp.where(den == 0, jnp.float32(1), den)
        dt = jnp.clip((thresh - d0) / safe, 0.0, 1.0)
        fx = ei.astype(jnp.float32) + jnp.where(ax == 0, dt, 0.0)
        fy = ej.astype(jnp.float32) + jnp.where(ax == 1, dt, 0.0)
        fz = ek.astype(jnp.float32) + jnp.where(ax == 2, dt, 0.0)
        vtx = jnp.stack(
            [fx * scale[0] + lower[0],
             fy * scale[1] + lower[1],
             fz * scale[2] + lower[2]], axis=-1)
        corners.append(jnp.where(valid_f[:, None], vtx, 0.0))
    soup = jnp.stack(corners, axis=1)  # (Fc, 3, 3)
    return MCSoupResult(soup, num_faces, a_ovf)


def marching_cubes_soup(
    density: Array,
    thresh: Union[float, Array],
    *,
    face_capacity: int,
    lower=None,
    upper=None,
    active_capacity: int = 0,
) -> MCSoupResult:
    """Jittable, differentiable triangle-soup marching cubes.

    Same triangles, same order as
    ``marching_cubes_padded(...).vertices[faces]`` (asserted in
    tests/test_marching_cubes.py), without building the indexed mesh — the
    fast path for pipelines that consume a soup (the cluster casters)."""
    density = jnp.asarray(density, jnp.float32)
    if density.ndim != 3 or min(density.shape) < 2:
        raise ValueError(
            f"density must be a 3-D grid with every dim >= 2, got "
            f"{density.shape}")
    X, Y, Z = density.shape
    lo = jnp.asarray([0.0, 0.0, 0.0] if lower is None else lower, jnp.float32)
    up = jnp.asarray([X, Y, Z] if upper is None else upper, jnp.float32)
    dev = jax.config.jax_default_device
    plat = dev.platform if dev is not None else jax.default_backend()
    fused = 1 if plat in ("tpu", "axon") else 0
    res = _mc_soup_impl(
        density, jnp.float32(thresh), lo, up, int(face_capacity), fused,
        int(active_capacity),
    )
    debug.check(
        jnp.logical_not(jnp.asarray(res.overflowed)),
        "marching_cubes_soup: capacity overflow (counted {f} faces)",
        f=res.num_faces,
    )
    return res


def marching_cubes_padded(
    density: Array,
    thresh: Union[float, Array],
    *,
    vert_capacity: Optional[int] = None,
    face_capacity: Optional[int] = None,
    lower=None,
    upper=None,
    vert_units: int = 0,
    cube_units: int = 0,
    active_capacity: int = 0,
    config=None,
) -> MCResult:
    """Jittable, differentiable marching cubes with static-capacity outputs.

    This is the building block for sharded / fused pipelines: fixed shapes in,
    fixed shapes out, no host synchronisation. Use :func:`marching_cubes` for
    an eager exact-size API mirroring the reference. Capacities may come from
    a :class:`core.config.MarchingCubesConfig` via ``config``; explicit
    arguments override it.
    """
    if config is not None:
        if vert_capacity is None:
            vert_capacity = config.vert_capacity
        if face_capacity is None:
            face_capacity = config.face_capacity
        vert_units = vert_units if vert_units else config.vert_units
        cube_units = cube_units if cube_units else config.cube_units
        active_capacity = (active_capacity if active_capacity
                           else config.active_capacity)
    if vert_capacity is None or face_capacity is None:
        raise ValueError(
            "vert_capacity/face_capacity required (directly or via config)")
    density = jnp.asarray(density, jnp.float32)
    if density.ndim != 3 or min(density.shape) < 2:
        raise ValueError(
            f"density must be a 3-D grid with every dim >= 2, got {density.shape}"
        )
    X, Y, Z = density.shape
    lo = jnp.asarray([0.0, 0.0, 0.0] if lower is None else lower, jnp.float32)
    up = jnp.asarray([X, Y, Z] if upper is None else upper, jnp.float32)
    # respect an enclosing jax.default_device(...) scope (the cpu= fallback):
    # the fused Pallas mask kernel only lowers on TPU
    dev = jax.config.jax_default_device
    plat = dev.platform if dev is not None else jax.default_backend()
    fused = 1 if plat in ("tpu", "axon") else 0
    res = _mc_padded_impl(
        density, jnp.float32(thresh), lo, up, int(vert_capacity),
        int(face_capacity), int(vert_units), int(cube_units), fused,
        int(active_capacity),
    )
    debug.check(
        jnp.logical_not(jnp.asarray(res.overflowed)),
        "marching_cubes_padded: capacity overflow "
        "(counted {v} verts / {f} faces)",
        v=res.num_vertices, f=res.num_faces,
    )
    return res


def _round_capacity(n: int) -> int:
    """Round up to the next power-of-two-ish bucket to bound recompilation."""
    n = max(int(n), 16)
    return 1 << (n - 1).bit_length()


def marching_cubes(
    density,
    thresh: float,
    scale: Optional[ScaleLike] = None,
    verbose: bool = False,
    cpu: bool = False,
) -> Tuple[Array, Array]:
    """Eager marching cubes: exact-size (vertices, faces), reference-style API.

    Mirrors ``prim3d.marching_cubes`` (reference:
    prim3d/utility/marching_cubes.py:34-98): ``scale`` is normalised to a bbox
    via the same rules; returns float32 vertices in world space and int32
    faces. Performs one device→host sync for the counts (the reference does
    the same readback, marching_cubes.cu:251-252), then runs the fused padded
    kernel and trims.

    ``cpu=True`` runs the extraction on the host CPU backend (the analog of
    the reference's PyMCubes fallback, marching_cubes.py:66-81) — same
    implementation, same output convention (the reference's CPU path divides
    by scale where its GPU path multiplies, marching_cubes.py:76-78 vs
    marching_cubes.cu:298; here both agree — see CHANGES.md).
    """
    if cpu:
        cpu_dev = jax.devices("cpu")[0]
        density = jax.device_put(jnp.asarray(density, jnp.float32), cpu_dev)
        with jax.default_device(cpu_dev):
            return marching_cubes(density, thresh, scale, verbose, cpu=False)
    density = jnp.asarray(density, jnp.float32)
    if density.ndim != 3 or min(density.shape) < 2:
        raise ValueError(
            f"density must be a 3-D grid with every dim >= 2, got {density.shape}"
        )
    lower, upper = resolve_bounds(density.shape, scale)
    nvj, nfj, _vuj, _cuj, naj = _counts_impl(density, jnp.float32(thresh))
    nv, nf = int(nvj), int(nfj)
    # unit budgets are obsolete (selection is exact since round 5) — NOT
    # forwarded: passing varying rounded values would key extra recompiles
    # on dead static args across frames of a changing surface
    res = marching_cubes_padded(
        density,
        thresh,
        vert_capacity=_round_capacity(nv),
        face_capacity=_round_capacity(nf),
        lower=lower,
        upper=upper,
        active_capacity=_round_capacity(int(naj)),
    )
    if verbose:
        print(f"#vertices={nv}")
        print(f"#triangles={nf}")
    return res.vertices[:nv], res.faces[:nf]

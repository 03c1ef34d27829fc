"""Multi-chip marching cubes: voxel-slab sharding with halo exchange.

The distributed analog of the single-chip op (ops/marching_cubes.py), built
the TPU way (SURVEY.md §5 "long-context" row): the density grid is sharded
into x-axis slabs across the mesh; each shard exchanges a single halo row
with its +x neighbour over ICI (``jax.lax.ppermute`` — the ring/halo
communication the reference never needed on one GPU), and vertex/face slots
come from a *globally consistent* numbering with no cross-shard duplication:

  * Vertices are numbered row-major: lattice row i owns the contiguous block
    ``[y-edge crossings(i), z-edge crossings(i), x-edge crossings(i)]``.
    Row order y,z,x is load-bearing: a shard can compute its +x halo row's
    y/z vertex ids purely from halo-row data (y/z crossings live within a
    row), which is exactly the set of foreign ids its seam cubes reference.
    SURVEY.md §7 hard part #4 (seam edges must get ONE global id) is solved
    by construction — the id of a seam vertex is the same arithmetic on
    either side of the seam.
  * Per-row counts are all-gathered (X values — tiny) and exclusive-scanned
    identically on every shard, replacing the reference's atomic counters
    with a distributed prefix scan.
  * Every shard owns a contiguous global id range, so outputs are per-shard
    padded buffers that concatenate into the global padded result.

Fully differentiable wrt the density grid (ppermute transposes to the
reverse permute in the backward pass).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..core import debug
from ..ops import mc_tables as T
from ..ops.marching_cubes import (_PACKED_TRI_FLAT, _excl_cumsum_flat,
                                  _expand_src, _ntris_vec, _twolevel_src)

Array = jax.Array

_NUM_TRIS = jnp.asarray(T.NUM_TRIS)


class ShardedMCResult(NamedTuple):
    """Per-shard padded outputs; concatenating shard-validity windows yields
    the global mesh. ``vert_base/face_base`` are each shard's global id
    offsets, ``vert_count/face_count`` its valid item counts.

    ``vert_count/face_count`` are TRUE counts and may exceed the per-shard
    capacities (the buffers then hold a truncated shard) — check
    :attr:`overflowed` before trusting a padded result, exactly like the
    single-chip :class:`~primitive3d_tpu.ops.marching_cubes.MCResult`."""

    vertices: Array  # (S * vert_cap_per_shard, 3)
    faces: Array  # (S * face_cap_per_shard, 3)
    vert_base: Array  # (S,)
    face_base: Array  # (S,)
    vert_count: Array  # (S,)
    face_count: Array  # (S,)

    @property
    def overflowed(self) -> Array:
        S = self.vert_base.shape[0]
        vcap = self.vertices.shape[0] // S
        fcap = self.faces.shape[0] // S
        return jnp.any(
            (self.vert_count > vcap) | (self.face_count > fcap)
        )


def _row_ids(c: Array) -> Array:
    """Exclusive within-row ranks for a (rows, ...) crossing mask.

    Row-major flat exclusive scan (the MXU triangular-matmul scan —
    a direct per-row ``jnp.cumsum`` over millions of elements lowers to
    log-depth passes on TPU and was the bulk of the sharded op's fixed
    overhead at S=1) minus each row's starting offset."""
    rows = c.shape[0]
    flat = c.reshape(rows, -1).astype(jnp.int32)
    g = _excl_cumsum_flat(flat.reshape(-1)).reshape(rows, -1)
    return (g - g[:, 0:1]).reshape(c.shape)


def sharded_marching_cubes(
    mesh: Mesh,
    density: Array,
    thresh: float,
    *,
    vert_cap_per_shard: int,
    face_cap_per_shard: int,
    axis_name: str = "x",
    vert_units: int = 0,
    cube_units: int = 0,
) -> ShardedMCResult:
    """Marching cubes over an x-sharded grid. Jittable under ``mesh``.

    ``density`` is (X, Y, Z); X that does not divide the mesh axis size is
    padded internally (edge-row replication, with all crossings and cubes in
    the padded rows masked out against the true row count), so any grid works
    on any mesh. Vertex world coordinates use the index-space convention
    (scale externally).
    """
    S = mesh.shape[axis_name]
    X, Y, Z = density.shape
    Xv = X  # true (valid) row count; rows >= Xv are padding
    Xp = -(-X // S) * S
    if Xp != X:
        density = jnp.concatenate(
            [density, jnp.broadcast_to(density[-1:], (Xp - X, Y, Z))], axis=0
        )
    thresh = jnp.float32(thresh)

    impl = functools.partial(
        mc_shard_body, thresh=thresh, axis_name=axis_name, S=S, Xv=Xv,
        vert_cap_per_shard=vert_cap_per_shard,
        face_cap_per_shard=face_cap_per_shard,
        vert_units=vert_units, cube_units=cube_units,
    )
    impl = functools.partial(
        shard_map, mesh=mesh,
        # vma inference cannot see through the fused Pallas mask kernel's
        # out_shape (ShapeDtypeStruct has no vma) — same opt-out as every
        # other shard_map in parallel/
        check_vma=False,
        in_specs=(P(axis_name, None, None),),
        out_specs=(
            P(axis_name, None),  # vertices
            P(axis_name, None),  # faces
            P(axis_name),  # vert_base
            P(axis_name),  # face_base
            P(axis_name),  # vert_count
            P(axis_name),  # face_count
        ),
    )(impl)
    v, f, vb, fb, vc, fc = impl(density)
    return ShardedMCResult(v, f, vb, fb, vc, fc)


def mc_shard_body(slab: Array, *, thresh, axis_name: str, S: int, Xv: int,
                  vert_cap_per_shard: int, face_cap_per_shard: int,
                  vert_units: int = 0, cube_units: int = 0):
    """Per-shard marching-cubes body — the inside of
    :func:`sharded_marching_cubes`'s shard_map, exposed so larger sharded
    programs (the flagship pipeline) can compose it inside their OWN
    shard_map. ``slab`` is this shard's (Xs, Y, Z) x-slab; collective ops
    run over ``axis_name`` of the enclosing mesh. Returns per-shard
    ``(verts, faces, vert_base[1], face_base[1], vert_count[1],
    face_count[1])`` with faces carrying globally consistent vertex ids.
    """
    if True:  # keep the original body's indentation
        Xs, Y, Z = slab.shape
        s = jax.lax.axis_index(axis_name)
        # --- halo exchange: receive the next shard's first row -------------
        first_row = slab[0:1]
        perm = [(i, (i - 1) % S) for i in range(S)]
        halo = jax.lax.ppermute(first_row, axis_name, perm)
        # Last shard wraps around; replace with its own last row (=> no
        # crossings/cubes past the grid boundary).
        halo = jnp.where(s == S - 1, slab[-1:], halo)
        g = jnp.concatenate([slab, halo], axis=0)  # (Xs+1, Y, Z)

        grow = s * Xs + jnp.arange(Xs + 1)  # global row of local row i
        rows_ok = (grow < Xv)[:, None, None]

        # crossings; y/z include the halo row, x covers owned rows only.
        # Rows past the true grid (x-padding for non-divisible X) are
        # edge-row replicas: their y/z crossings would duplicate the last
        # real row's, so they are masked against the true row count. The
        # fused Pallas mask kernel computes all four stencils in one sweep
        # on TPU (round-5 x1-overhead fix; the XLA stencil path remains for
        # CPU/interpret).
        dev = jax.config.jax_default_device
        plat = dev.platform if dev is not None else jax.default_backend()
        if plat in ("tpu", "axon"):
            from ..kernels.mc_masks import fused_masks

            cxk, cyk, czk, cmask = fused_masks(
                jax.lax.stop_gradient(g), thresh)
            cy = cyk.astype(bool) & rows_ok
            cz = czk.astype(bool) & rows_ok
            cx = cxk.astype(bool) & rows_ok[:Xs]
        else:
            occ = g > thresh
            cy = (occ[:, :-1, :] != occ[:, 1:, :]) & rows_ok
            cz = (occ[:, :, :-1] != occ[:, :, 1:]) & rows_ok
            cx = (occ[:-1] != occ[1:]) & rows_ok[:Xs]
            cmask = None

        # --- unified row-major edge layout ----------------------------------
        # Per point-row i: [y-block (Y-1)*Z, z-block Y*(Z-1), x-block Y*Z]
        # (x-block zeros for the halo row — its x-edges belong to the next
        # shard). ONE (Xs+1, rowlen) mask replaces round-4's three separate
        # per-axis scans + three grid-scale id arrays: a single scan
        # numbers everything, the face pass gathers from a single flat id
        # array, and the row order y,z,x keeps seam ids computable from
        # halo-row data alone (y/z crossings live within a row).
        rowlen = (Y - 1) * Z + Y * (Z - 1) + Y * Z
        nyr = (Y - 1) * Z
        nzr = Y * (Z - 1)
        crow = jnp.concatenate(
            [
                cy.reshape(Xs + 1, -1).astype(jnp.int32),
                cz.reshape(Xs + 1, -1).astype(jnp.int32),
                jnp.concatenate(
                    [cx.reshape(Xs, -1).astype(jnp.int32),
                     jnp.zeros((1, Y * Z), jnp.int32)], axis=0),
            ],
            axis=1,
        )  # (Xs+1, rowlen)

        row_tot_local = jnp.sum(crow[:Xs], axis=1, dtype=jnp.int32)

        # --- global per-row offsets (distributed prefix scan) --------------
        row_tot_all = jax.lax.all_gather(
            row_tot_local, axis_name, tiled=True
        )  # (Xp,)
        row_off = jnp.cumsum(row_tot_all) - row_tot_all  # identical everywhere
        total_v = jnp.sum(row_tot_all)

        grow_c = jnp.minimum(grow, Xv - 1)
        off = row_off[grow_c]  # (Xs+1,) base id of each visible row
        # out-of-grid halo row (last shard): no vertices, point past end
        off = jnp.where(grow > Xv - 1, total_v, off)

        # global ids for every local edge slot (owned + halo-row y/z)
        ids_full = (off[:, None] + _row_ids(crow)).reshape(-1)

        vbase = off[0]
        vcount = row_off[jnp.minimum((s + 1) * Xs, Xv - 1)] - vbase
        vcount = jnp.where((s + 1) * Xs > Xv - 1, total_v - vbase, vcount)

        gx0 = (s * Xs).astype(jnp.float32)

        # Owned vertices in local-id order. Select the first vert_cap
        # crossing-edge indices (exact popcount-prefix selection), DECODE
        # each flat row-major edge index back to its two grid endpoints,
        # and gather just those 2*cap density values — materializing
        # grid-scale position arrays instead costs 3 x E x f32 whose TPU
        # minor-dim padding (3 -> 128) exploded 600 MB into 25 GB at
        # 256^3 x 1 shard (round-2 lesson). Gradients flow through the
        # d0/d1 gathers and the halo ppermute.
        mask_flat = crow[:Xs].reshape(-1)
        del vert_units  # selection is exact since round 5; no unit budget
        src, _ = _twolevel_src(mask_flat, vert_cap_per_shard, 0)
        i = src // rowlen
        r = src % rowlen
        is_y = r < nyr
        is_z = jnp.logical_not(is_y) & (r < nyr + nzr)
        is_x = r >= nyr + nzr
        rz = r - nyr
        rx = r - nyr - nzr
        j = jnp.where(is_y, r // Z, jnp.where(is_z, rz // (Z - 1), rx // Z))
        k = jnp.where(is_y, r % Z, jnp.where(is_z, rz % (Z - 1), rx % Z))
        gf = g.reshape(-1)
        base = (i * Y + j) * Z + k
        step = jnp.where(is_y, Z, jnp.where(is_z, 1, Y * Z))
        d0 = gf[base]
        d1 = gf[base + step]  # x-edges read the halo row at i == Xs - 1
        den = d1 - d0
        dt = jnp.clip(
            (thresh - d0) / jnp.where(den == 0, 1.0, den), 0.0, 1.0)
        fxc = i.astype(jnp.float32) + gx0 + jnp.where(is_x, dt, 0.0)
        fyc = j.astype(jnp.float32) + jnp.where(is_y, dt, 0.0)
        fzc = k.astype(jnp.float32) + jnp.where(is_z, dt, 0.0)
        valid_v = (jnp.arange(vert_cap_per_shard, dtype=jnp.int32)
                   < jnp.sum(mask_flat, dtype=jnp.int32))
        verts = jnp.where(
            valid_v[:, None], jnp.stack([fxc, fyc, fzc], axis=-1), 0.0)

        # --- faces -----------------------------------------------------------
        # cube rows 0..Xs-1 (global rows s*Xs .. s*Xs+Xs-1; cubes exist for
        # global rows < X-1 — the trailing rows on the last shard produce
        # mask 0 automatically because halo == last row there)
        if cmask is None:
            occ_i = (g > thresh).astype(jnp.int32)
            m = (
                occ_i[:-1, :-1, :-1] * 1
                + occ_i[1:, :-1, :-1] * 2
                + occ_i[1:, 1:, :-1] * 4
                + occ_i[:-1, 1:, :-1] * 8
                + occ_i[:-1, :-1, 1:] * 16
                + occ_i[1:, :-1, 1:] * 32
                + occ_i[1:, 1:, 1:] * 64
                + occ_i[:-1, 1:, 1:] * 128
            )  # (Xs, Y-1, Z-1)
        else:
            m = cmask
        # mask out cubes whose +x row is outside the true grid (x-padding
        # replicas would otherwise emit duplicate geometry via y/z mixing)
        cube_valid = (grow[:Xs] < Xv - 1)[:, None, None]
        m = jnp.where(cube_valid, m, 0)
        mask = m.reshape(Xs, -1)

        ntris = _ntris_vec(mask)  # (Xs, C_row) — vector ops, no gather
        row_f = jnp.sum(ntris, axis=1, dtype=jnp.int32)
        row_f_all = jax.lax.all_gather(row_f, axis_name, tiled=True)  # (Xp,)
        frow_off = jnp.cumsum(row_f_all) - row_f_all
        total_f = jnp.sum(row_f_all)
        fbase = frow_off[jnp.minimum(s * Xs, Xv - 1)]
        fnext = jnp.minimum((s + 1) * Xs, Xv)
        fcount = jnp.where(
            fnext >= Xv, total_f - fbase,
            frow_off[jnp.minimum(fnext, Xv - 1)] - fbase,
        )

        # active-cube face emission over the shard's local slot range (same
        # exact selection as ops/marching_cubes: compact active cubes, then
        # search only the compacted cumulative ranges)
        ntris_f = ntris.reshape(-1)
        amask = (ntris_f > 0).astype(jnp.int32)
        del cube_units  # selection is exact since round 5; no unit budget
        asrc, _ = _twolevel_src(amask, face_cap_per_shard, 0)
        n_active = jnp.sum(amask, dtype=jnp.int32)
        valid_a = jnp.arange(face_cap_per_shard, dtype=jnp.int32) < n_active
        ntris_a = jnp.where(valid_a, ntris_f[asrc], 0)
        # gather-thrift slot decode (see ops/marching_cubes): sort-free
        # rank decoding over per-cube triangle counts; the cube id and
        # cube mask ride one row gather per slot
        mask_a = jnp.where(valid_a, mask.reshape(-1)[asrc], 0)
        rowA = jnp.stack([asrc, mask_a], axis=1)
        s_q = jnp.arange(1, face_cap_per_shard + 1, dtype=jnp.int32)
        apos, kk = _expand_src(ntris_a, face_cap_per_shard)
        rw = rowA[apos]
        cube = rw[:, 0]
        valid_f = s_q <= fcount
        # bit-packed per-triangle edge info + computed flat indices into the
        # UNIFIED row-major id array (one gather per face column instead of
        # round-4's three per-axis gathers + select)
        CY, CZ = Y - 1, Z - 1
        ci = cube // (CY * CZ)
        cj = (cube // CZ) % CY
        ck = cube % CZ
        pk = _PACKED_TRI_FLAT[
            rw[:, 1] * T.MAX_TRIS_PER_CUBE
            + jnp.clip(kk, 0, T.MAX_TRIS_PER_CUBE - 1)
        ]
        fcols = []
        for j in range(3):
            info = (pk >> (5 * j)) & 31
            ax = info >> 3
            ox = (info >> 2) & 1
            oy = (info >> 1) & 1
            oz = info & 1
            # flat positions in the per-row [y | z | x] edge layout
            fy = (ci + ox) * rowlen + cj * Z + (ck + oz)
            fz = (ci + ox) * rowlen + nyr + (cj + oy) * (Z - 1) + ck
            fx = ci * rowlen + nyr + nzr + (cj + oy) * Z + (ck + oz)
            gidx = jnp.where(
                ax == 0, fx, jnp.where(ax == 1, fy, fz))
            fcols.append(jnp.where(valid_f, ids_full[gidx], 0))
        faces = jnp.stack(fcols, axis=-1)

        # Device-side overflow assert (opt-in via core.debug.checks): a shard
        # whose surface exceeds its per-shard capacity silently truncates the
        # padded buffers; callers either gate on ShardedMCResult.overflowed
        # or trace under debug.checked to fail loudly (round-5 advisor fix).
        debug.check(
            (vcount <= vert_cap_per_shard) & (fcount <= face_cap_per_shard),
            "mc_shard_body: per-shard capacity overflow "
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


def gather_sharded_mesh(res: ShardedMCResult) -> Tuple[Array, Array]:
    """Host-side compaction of a ShardedMCResult into exact-size arrays."""
    import numpy as np

    S = res.vert_base.shape[0]
    vcap = res.vertices.shape[0] // S
    fcap = res.faces.shape[0] // S
    v = np.asarray(res.vertices).reshape(S, vcap, 3)
    f = np.asarray(res.faces).reshape(S, fcap, 3)
    vn = np.asarray(res.vert_count)
    fn = np.asarray(res.face_count)
    verts = np.concatenate([v[s, : vn[s]] for s in range(S)], axis=0)
    faces = np.concatenate([f[s, : fn[s]] for s in range(S)], axis=0)
    return verts, faces

"""Two-level cluster acceleration structure for the Pallas ray caster.

Morton-sorted triangles grouped into fixed-size clusters (leaves of the
implicit top level), each with an AABB. This is the TPU-shaped analog of the
reference's BVH leaves-of-8 (reference: ray_cast.cu:374 passes
n_primitives_per_leaf=8): wide, regular leaves that map onto (8, 128) VPU
tiles instead of deep irregular trees.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import triangle as tri_ops
from .morton import morton3d

Array = jax.Array

CLUSTER_SIZE = 128  # one VPU lane row of triangles


SUB_SIZE = 8  # triangles per sub-box (second culling level)


class ClusterBVH(NamedTuple):
    boxes: Array  # (C, 6) float32: lo_xyz, hi_xyz per cluster
    sub_boxes: Array  # (C, cluster_size/SUB_SIZE, 6) float32 second level
    tri_data: Array  # (C, cluster_size, 9) float32: a, e1=b-a, e2=c-a
    prim_order: Array  # (C * CLUSTER_SIZE,) int32; -1 for padding slots

    @property
    def num_clusters(self) -> int:
        return self.boxes.shape[0]


@functools.partial(jax.jit, static_argnames=("cluster_size", "order"))
def build_clusters(tris: Array, cluster_size: int = CLUSTER_SIZE,
                   order: str = "morton") -> ClusterBVH:
    """Build the cluster structure from (T, 3, 3) triangles, on device.

    ``order="morton"`` (default) sorts triangles by centroid Morton code so
    clusters are spatially compact. ``order="identity"`` keeps the input
    order — the right choice when the soup is already spatially coherent
    (marching-cubes emission follows the grid scan order): it skips the
    argsort + 9-float reorder gather, and ``prim_order`` becomes the
    identity, which lets gradient scatters in cluster space map back to
    face space with a reshape instead of a permutation.
    """
    T = tris.shape[0]
    pad = (-T) % cluster_size
    if order == "identity":
        # same padding trick as the morton path: replicate the last triangle
        # so the tail cluster's AABB stays tight (zeros would drag it to the
        # origin); prim_order=-1 marks the slots
        last = tris[-1] if T > 0 else jnp.zeros((3, 3), tris.dtype)
        ts = jnp.concatenate(
            [tris, jnp.broadcast_to(last, (pad, 3, 3))], axis=0
        )
        prim = jnp.concatenate(
            [jnp.arange(T, dtype=jnp.int32),
             jnp.full((pad,), -1, jnp.int32)]
        )
    else:
        cent = tri_ops.centroids(tris)
        lo = jnp.min(jnp.min(tris, axis=1), axis=0)
        hi = jnp.max(jnp.max(tris, axis=1), axis=0)
        codes = morton3d(cent, lo, hi)
        sorder = jnp.argsort(codes).astype(jnp.int32)

        # Padding slots replicate the last triangle (harmless duplicates —
        # same closest-hit result) rather than degenerate zeros, so cluster
        # AABBs stay tight; prim_order=-1 marks them for id remapping.
        order_p = jnp.concatenate(
            [sorder, jnp.full((pad,), sorder[-1] if T > 0 else 0, jnp.int32)]
        )
        ts = tris[order_p]  # (Tp, 3, 3)
        prim = jnp.concatenate([sorder, jnp.full((pad,), -1, jnp.int32)])

    C = ts.shape[0] // cluster_size
    tc = ts.reshape(C, cluster_size, 3, 3)
    box_lo = jnp.min(tc.reshape(C, -1, 3), axis=1)
    box_hi = jnp.max(tc.reshape(C, -1, 3), axis=1)
    boxes = jnp.concatenate([box_lo, box_hi], axis=-1)  # (C, 6)

    nsub = cluster_size // SUB_SIZE
    sc = tc.reshape(C, nsub, SUB_SIZE * 3, 3)
    sub_boxes = jnp.concatenate(
        [jnp.min(sc, axis=2), jnp.max(sc, axis=2)], axis=-1
    )  # (C, nsub, 6)

    a = tc[:, :, 0]
    tri_data = jnp.concatenate(
        [a, tc[:, :, 1] - a, tc[:, :, 2] - a], axis=-1
    )  # (C, 128, 9)
    return ClusterBVH(boxes, sub_boxes, tri_data, prim)


class MxuClusterBVH(NamedTuple):
    """Cluster structure for the MXU kernel: per-cluster Plücker matrices.

    ``w[c]`` is a (16, 4*S) matrix so that ``rvec @ w[c]`` computes, for all
    S triangles of cluster c at once: the three ray-edge Plücker side
    products (lanes [0:S], [S:2S], [2S:3S]) and the hit numerator (a-ro).N
    ([3S:4S]). The hit denominator rd.N is NOT a separate product: with
    unnormalized edge columns the three side products sum to it exactly
    (a×b + b×c + c×a = (b-a)×(c-a) = N), so the kernel computes
    den = s0 + s1 + s2 with two vector adds instead of a fourth matmul
    set. Ray 16-vector layout: [rd, ro x rd, ro, 1, 0*6]. Same formulation
    as mxu_cast.py, reshaped so one cluster is one MXU weight matrix.

    ``w2`` stacks the bf16 hi/lo split of w along the contraction dim as
    [wh; wh; wl] (48, 4*S). Against a ray block stacked as r2 = [rh; rl; rh],
    ONE K=48 matmul computes wh·rh + wh·rl + wl·rh — the same ~f32-accurate
    3-term double-bf16 product as three separate K=16 matmuls, in one MXU
    issue. The shallow matmuls are latency-bound, so issue count — not
    FLOPs — sets the visit cost; K=48 also uses the systolic depth 3x
    better. (Stacking as [wh; wl]·[rh; rl] would pair the blocks 1:1 and
    compute only wh·rh + wl·rl — missing cross terms.)
    """

    boxes: Array  # (C, 6) float32 cluster AABBs
    w2: Array  # (C, 48, 4*S) bfloat16: [hi; hi; lo] along contraction
    prim_order: Array  # (C*S,) int32; -1 for padding slots
    fin: Array  # (C, 24, S) bfloat16 finish rows x3 split (see build)

    @property
    def num_clusters(self) -> int:
        return self.boxes.shape[0]

    @property
    def cluster_size(self) -> int:
        return self.w2.shape[2] // 4


@functools.partial(jax.jit, static_argnames=("cluster_size", "order"))
def build_mxu_clusters(
    tris: Array, cluster_size: int = CLUSTER_SIZE, order: str = "morton"
) -> MxuClusterBVH:
    """Build the MXU cluster structure from (T, 3, 3) triangles, on device.

    ``fin`` packs everything the caster needs to finish a winning ray —
    unnormalized face normal n, plane offset a.n, 1/|n|, and the ORIGINAL
    face id as an exact float (ids < 2^24) — laid out (8, S) per cluster so
    the kernel can select a winner's row with one (8, S) x (S, rchunk)
    one-hot matmul on the MXU instead of the caller doing per-ray dynamic
    gathers (~9 ns/element; the old epilogue cost ~4x the kernel at image
    scale). This writes the reference's full per-ray output buffers (depth/
    normal/primitive id, reference: src/prim3d/Geometry/bvh.cu:330-345) at
    kernel speed.
    """
    base = build_clusters(tris, cluster_size=cluster_size, order=order)
    C = base.num_clusters
    S = cluster_size
    td = base.tri_data  # (C, S, 9): a, e1, e2
    a = td[..., 0:3]
    b = a + td[..., 3:6]
    c3 = a + td[..., 6:9]
    n = jnp.cross(b - a, c3 - a)

    # Columns are deliberately UNNORMALIZED: bf16 error is relative to each
    # column's scale either way (s_i scales with |u_i|, so the sign-ambiguity
    # band is scale-invariant), and keeping the raw Plücker edges preserves
    # the exact identity den = s0 + s1 + s2 — the denominator product is
    # recovered in the kernel with two adds instead of a matmul set. A shared
    # edge of two triangles still maps to exactly negated columns, keeping
    # meshes watertight.
    def edge_col(p, q):  # (C, S, 16)
        u = jnp.concatenate([jnp.cross(p, q), q - p], -1)
        return jnp.concatenate([u, jnp.zeros((C, S, 10), td.dtype)], -1)

    z6 = jnp.zeros((C, S, 6), td.dtype)
    num_col = jnp.concatenate(
        [z6, -n, jnp.sum(a * n, -1, keepdims=True), z6], -1
    )
    cols = jnp.stack(
        [edge_col(a, b), edge_col(b, c3), edge_col(c3, a), num_col],
        axis=1,
    )  # (C, 4, S, 16)
    # Degenerate triangles (repeated vertex / zero normal — capacity-padding
    # faces [0,0,0] de-index to point triangles at v0) must get exactly-zero
    # columns: XLA contracts cross() into FMAs, so cross(a, a) leaves a tiny
    # rounding residue that would make s0 = s1 = s2 = residue, num = 0 pass
    # the sign-agreement test as a spurious t = 0 hit winning the packed min.
    deg = (
        jnp.all(td[..., 3:6] == 0.0, axis=-1)
        | jnp.all(td[..., 6:9] == 0.0, axis=-1)
        | jnp.all(b == c3, axis=-1)
        | jnp.all(n == 0.0, axis=-1)
    )  # (C, S)
    cols = jnp.where(deg[:, None, :, None], 0.0, cols)
    w = cols.transpose(0, 3, 1, 2).reshape(C, 16, 4 * S)
    # hi/lo bf16 split stacked on the contraction dim (see MxuClusterBVH.w2).
    # reduce_precision (not a dtype cast round-trip, which XLA elides as
    # excess precision, silently making wl == 0) guarantees the rounding
    # happens.
    wh32 = jax.lax.reduce_precision(w, exponent_bits=8, mantissa_bits=7)
    wh = wh32.astype(jnp.bfloat16)
    wl = (w - wh32).astype(jnp.bfloat16)
    w2 = jnp.concatenate([wh, wh, wl], axis=1)  # (C, 48, 4*S)

    # finish rows (C, 8, S): [n, a.n, 1/|n|, fid, 0, 0] per triangle slot.
    # fid is the original face id as a float (exact below 2^24; the stream
    # tier caps clusters at 32767 * S = 4.2M triangles); padding slots carry
    # -1.0 so the caller's hit gate (fid >= 0) rejects them.
    inv = 1.0 / jnp.maximum(jnp.linalg.norm(n, axis=-1), 1e-30)
    fid = base.prim_order.reshape(C, S).astype(jnp.float32)
    zro = jnp.zeros((C, S), jnp.float32)
    fin32 = jnp.stack(
        [n[..., 0], n[..., 1], n[..., 2], jnp.sum(a * n, -1), inv, fid,
         zro, zro],
        axis=1,
    )  # (C, 8, S)
    # Exact bf16x3 split stacked on the row dim: f1 + f2 + f3 == fin32 to
    # f32 faithfulness (24-bit mantissa = 3 x 8-bit bf16 heads; integer fids
    # below 2^24 split exactly). The kernel selects a winner's row with ONE
    # DEFAULT-precision bf16 one-hot matmul (2 MXU tile issues instead of
    # f32 HIGHEST's ~6 passes) and adds the three (8, rchunk) slices back.
    f1_32 = jax.lax.reduce_precision(fin32, exponent_bits=8, mantissa_bits=7)
    r1 = fin32 - f1_32
    f2_32 = jax.lax.reduce_precision(r1, exponent_bits=8, mantissa_bits=7)
    f3 = (r1 - f2_32).astype(jnp.bfloat16)
    fin = jnp.concatenate(
        [f1_32.astype(jnp.bfloat16), f2_32.astype(jnp.bfloat16), f3], axis=1
    )  # (C, 24, S)
    return MxuClusterBVH(base.boxes, w2, base.prim_order, fin)

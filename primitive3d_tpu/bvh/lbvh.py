"""LBVH: fully parallel on-device BVH construction (Karras 2012).

Replaces the reference's serial CPU build — top-down nth_element median splits
on the max-variance axis, then cudaMemcpy upload (reference:
src/prim3d/Geometry/bvh.cu:209-300) — with a TPU-native pipeline that runs
entirely on device under jit:

  1. Morton-code triangle centroids inside the scene bbox (bvh/morton.py).
  2. ``jax.lax.sort`` by code (index-augmented delta makes keys unique).
  3. Karras binary radix tree: every internal node's range/split is computed
     independently (vectorised fixed-trip-count searches — no recursion, no
     data-dependent Python control flow).
  4. Internal-node AABBs by range-min/max query over the sorted leaf AABBs
     with a doubling sparse table — replacing the bottom-up atomic-flag pass
     GPUs use (atomics don't exist in the TPU programming model).

The tree is different from the reference's (LBVH vs variance-axis median
split); parity is defined on query results, never on tree layout (SURVEY.md
§7 "hard parts" #3).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import triangle as tri_ops
from .morton import morton3d

Array = jax.Array


DONE = jnp.int32(2**30)  # traversal-terminated sentinel pointer

# Fixed number of escape-link resolution passes = max supported tree depth.
# A Karras tree over 30-bit Morton codes with index tie-breaks has depth
# O(log T) for non-adversarial inputs; 128 covers meshes far beyond 10^7 tris.
MAX_DEPTH = 128


class LBVH(NamedTuple):
    """Struct-of-arrays binary BVH over T triangles (T-1 internal nodes).

    Child encoding: >= 0 -> internal node index; < 0 -> leaf ``~child`` in
    Morton order (one triangle per leaf). Same negative-index leaf trick as
    the reference's nodes (reference: bvh.h:12-16, decode bvh.cu:163-165).

    ``escape`` / ``escape_leaf`` thread the tree in preorder for stackless
    traversal: the next node to visit when a subtree is skipped (box miss) or
    finished (leaf processed). DONE terminates.
    """

    left: Array  # (I,) int32
    right: Array  # (I,) int32
    box_lo: Array  # (I, 3) float32  internal-node AABB min
    box_hi: Array  # (I, 3) float32  internal-node AABB max
    escape: Array  # (I,) int32  preorder skip link of internal node
    escape_leaf: Array  # (T,) int32  preorder skip link of leaf
    tris_sorted: Array  # (T, 3, 3) float32  triangles in Morton order
    prim_order: Array  # (T,) int32  leaf k -> original triangle index

    @property
    def num_triangles(self) -> int:
        return self.tris_sorted.shape[0]


def _delta_fn(codes: Array):
    """Common-prefix length with index tie-break; -1 out of range.

    With the index augmentation every key is unique, which Karras' range
    construction requires.
    """
    T = codes.shape[0]

    def delta(i: Array, j: Array) -> Array:
        valid = (j >= 0) & (j <= T - 1)
        jc = jnp.clip(j, 0, T - 1)
        ci, cj = codes[i], codes[jc]
        same = ci == cj
        d_code = jax.lax.clz(ci ^ cj).astype(jnp.int32)
        d_idx = 32 + jax.lax.clz((i ^ jc).astype(jnp.uint32)).astype(jnp.int32)
        return jnp.where(valid, jnp.where(same, d_idx, d_code), -1)

    return delta


@jax.jit
def build_lbvh(tris: Array) -> LBVH:
    """Build an LBVH over triangles (T, 3, 3), T >= 2. Jit-compatible."""
    T = tris.shape[0]
    cent = tri_ops.centroids(tris)
    scene_lo = jnp.min(jnp.min(tris, axis=1), axis=0)
    scene_hi = jnp.max(jnp.max(tris, axis=1), axis=0)
    codes = morton3d(cent, scene_lo, scene_hi)

    order = jnp.argsort(codes)
    codes = codes[order]
    tris_sorted = tris[order]
    prim_order = order.astype(jnp.int32)

    delta = _delta_fn(codes)
    i = jnp.arange(T - 1, dtype=jnp.int32)

    d = jnp.sign(delta(i, i + 1) - delta(i, i - 1)).astype(jnp.int32)
    dmin = delta(i, i - d)

    # upper bound for the range length: masked doubling, fixed 32 trips
    lmax = jnp.full_like(i, 2)
    for _ in range(32):
        grow = delta(i, i + lmax * d) > dmin
        lmax = jnp.where(grow, lmax * 2, lmax)

    # binary search the exact other end j = i + l*d
    l = jnp.zeros_like(i)
    t = lmax // 2
    for _ in range(32):
        probe = l + t
        ok = (t >= 1) & (delta(i, i + probe * d) > dmin)
        l = jnp.where(ok, probe, l)
        t = t // 2
    j = i + l * d

    # split position: do-while with t = ceil(t/2), fixed trips
    dnode = delta(i, j)
    s = jnp.zeros_like(i)
    t = l
    done = jnp.zeros_like(i, dtype=bool)
    for _ in range(33):
        t_half = (t + 1) >> 1
        add = (~done) & (delta(i, i + (s + t_half) * d) > dnode)
        s = jnp.where(add, s + t_half, s)
        done = done | (t_half <= 1)
        t = t_half
    gamma = i + s * d + jnp.minimum(d, 0)

    lo_r = jnp.minimum(i, j)
    hi_r = jnp.maximum(i, j)
    left = jnp.where(lo_r == gamma, ~gamma, gamma)
    right = jnp.where(hi_r == gamma + 1, ~(gamma + 1), gamma + 1)

    # --- internal-node AABBs: sparse-table range min/max over leaf AABBs -----
    leaf_lo = jnp.min(tris_sorted, axis=1)  # (T, 3)
    leaf_hi = jnp.max(tris_sorted, axis=1)
    K = max(1, (T - 1).bit_length())
    tbl_lo = [leaf_lo]
    tbl_hi = [leaf_hi]
    for k in range(1, K):
        half = 1 << (k - 1)
        idx = jnp.minimum(jnp.arange(T) + half, T - 1)
        tbl_lo.append(jnp.minimum(tbl_lo[-1], tbl_lo[-1][idx]))
        tbl_hi.append(jnp.maximum(tbl_hi[-1], tbl_hi[-1][idx]))
    tbl_lo = jnp.stack(tbl_lo)  # (K, T, 3)
    tbl_hi = jnp.stack(tbl_hi)

    length = hi_r - lo_r + 1
    k_q = 31 - jax.lax.clz(length.astype(jnp.uint32)).astype(jnp.int32)
    k_q = jnp.clip(k_q, 0, K - 1)
    start2 = hi_r - (1 << k_q) + 1
    box_lo = jnp.minimum(tbl_lo[k_q, lo_r], tbl_lo[k_q, start2])
    box_hi = jnp.maximum(tbl_hi[k_q, lo_r], tbl_hi[k_q, start2])

    # --- preorder escape links (stackless threading) -------------------------
    # parent/is-left for every child, in internal-id and leaf-id spaces
    I = T - 1
    node_ids = jnp.arange(I, dtype=jnp.int32)

    parent_int = jnp.zeros((I,), jnp.int32)
    isleft_int = jnp.zeros((I,), bool)
    parent_leaf = jnp.zeros((T,), jnp.int32)
    isleft_leaf = jnp.zeros((T,), bool)
    for child, left_side in ((left, True), (right, False)):
        is_leaf = child < 0
        int_idx = jnp.where(is_leaf, I, child)  # OOB -> drop
        leaf_idx = jnp.where(is_leaf, ~child, T)
        parent_int = parent_int.at[int_idx].set(node_ids, mode="drop")
        isleft_int = isleft_int.at[int_idx].set(left_side, mode="drop")
        parent_leaf = parent_leaf.at[leaf_idx].set(node_ids, mode="drop")
        isleft_leaf = isleft_leaf.at[leaf_idx].set(left_side, mode="drop")

    # esc(left child)  = right sibling
    # esc(right child) = esc(parent); root = DONE. Resolve by iterating the
    # recurrence down the tree (MAX_DEPTH passes, each a (I,) gather; values
    # propagate one level per pass from the root).
    esc_init = jnp.where(isleft_int, right[parent_int], DONE).at[0].set(DONE)

    def esc_pass(_, e):
        return (
            jnp.where(isleft_int, right[parent_int], e[parent_int])
            .at[0]
            .set(DONE)
        )

    esc_int = jax.lax.fori_loop(0, MAX_DEPTH, esc_pass, esc_init)
    escape_leaf = jnp.where(
        isleft_leaf, right[parent_leaf], esc_int[parent_leaf]
    )
    if T == 1:  # degenerate (no internal nodes) — handled by caller anyway
        escape_leaf = jnp.full((T,), DONE, jnp.int32)

    return LBVH(
        left, right, box_lo, box_hi, esc_int, escape_leaf, tris_sorted, prim_order
    )

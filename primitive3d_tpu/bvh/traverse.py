"""Stackless threaded LBVH traversal (pure XLA, batch-vectorised).

TPU-first replacement for the reference's per-thread stack traversal
(reference: src/prim3d/Geometry/bvh.cu:147-193 — depth-32 FixedStack, 4-way
sorting-network child ordering): each ray's entire traversal state is three
scalars (current node pointer, best t, best leaf), and the tree is *threaded*
with precomputed preorder escape links (bvh/lbvh.py), so one traversal step
is: a box test -> follow hit link (first child) or escape link. No per-ray
stack, no scatter in the inner loop — just gathers and selects over the whole
ray batch, which XLA vectorises cleanly across the VPU lanes.

The whole batch advances in lockstep inside one ``lax.while_loop`` that runs
until every ray has reached the DONE sentinel; finished rays no-op. Fixed
preorder (no near-child-first) trades some early-termination efficiency for a
dramatically simpler SIMD state — the Pallas kernel path refines this.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry import triangle as tri_ops
from .lbvh import DONE, LBVH

Array = jax.Array


@jax.jit
def cast_rays(bvh: LBVH, origins: Array, dirs: Array, max_dist: Array):
    """Batched closest-hit query: (depth, leaf_index) per ray; leaf=-1 miss."""
    R = origins.shape[0]
    inv = 1.0 / dirs  # (R, 3); +-inf on zero components (slab test handles)

    def step(state):
        node, best_t, best_i = state
        is_leaf = node < 0
        active = node != DONE

        # --- internal: box test --------------------------------------------
        n_int = jnp.clip(jnp.where(is_leaf, 0, node), 0, bvh.left.shape[0] - 1)
        lo = bvh.box_lo[n_int]
        hi = bvh.box_hi[n_int]
        t0 = (lo - origins) * inv
        t1 = (hi - origins) * inv
        tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
        box_hit = (tmin <= tmax) & (tmax >= 0) & (tmin < best_t)

        # --- leaf: triangle test -------------------------------------------
        k = jnp.where(is_leaf, ~node, 0)
        t_tri = tri_ops.ray_intersect(origins, dirs, bvh.tris_sorted[k])
        better = active & is_leaf & (t_tri < best_t)
        best_t = jnp.where(better, t_tri, best_t)
        best_i = jnp.where(better, k, best_i)

        # --- advance pointer ------------------------------------------------
        nxt_internal = jnp.where(box_hit, bvh.left[n_int], bvh.escape[n_int])
        nxt_leaf = bvh.escape_leaf[k]
        nxt = jnp.where(is_leaf, nxt_leaf, nxt_internal)
        node = jnp.where(active, nxt, DONE)
        return node, best_t, best_i

    def cond(state):
        return jnp.any(state[0] != DONE)

    init = (
        jnp.zeros((R,), jnp.int32),  # root
        jnp.full((R,), max_dist, jnp.float32),
        jnp.full((R,), -1, jnp.int32),
    )
    _, best_t, best_i = jax.lax.while_loop(cond, step, init)
    return best_t, best_i

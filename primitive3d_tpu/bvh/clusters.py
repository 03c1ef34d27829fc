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


@functools.partial(jax.jit, static_argnames=("cluster_size",))
def build_clusters(tris: Array, cluster_size: int = CLUSTER_SIZE) -> ClusterBVH:
    """Build the cluster structure from (T, 3, 3) triangles, on device."""
    T = tris.shape[0]
    cent = tri_ops.centroids(tris)
    lo = jnp.min(jnp.min(tris, axis=1), axis=0)
    hi = jnp.max(jnp.max(tris, axis=1), axis=0)
    codes = morton3d(cent, lo, hi)
    order = jnp.argsort(codes).astype(jnp.int32)

    pad = (-T) % cluster_size
    # Padding slots replicate the last triangle (harmless duplicates — same
    # closest-hit result) rather than degenerate zeros, so cluster AABBs stay
    # tight; prim_order=-1 marks them for id remapping.
    order_p = jnp.concatenate(
        [order, jnp.full((pad,), order[-1] if T > 0 else 0, jnp.int32)]
    )
    ts = tris[order_p]  # (Tp, 3, 3)
    prim = jnp.concatenate([order, jnp.full((pad,), -1, jnp.int32)])

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

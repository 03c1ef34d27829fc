"""BVH-backed RayCaster (build once on device, cast many).

The TPU-native equivalent of the reference's custom-BVH backend
(reference: src/prim3d/Utility/ray_cast.cu:340-423): LBVH build (bvh/lbvh.py)
plus vmapped stack traversal (bvh/traverse.py), returning the same
depth / normal / face-id buffers with the same miss semantics.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry import triangle as tri_ops
from ..raycast import DEFAULT_MAX_DIST, RayCaster, RayHits, _cast_bruteforce
from .lbvh import build_lbvh
from .traverse import cast_rays

Array = jax.Array


class BvhRayCaster(RayCaster):
    def __init__(self, vertices, faces, max_dist: float = DEFAULT_MAX_DIST):
        super().__init__(vertices, faces, max_dist)
        if self.num_triangles >= 2:
            self.bvh = jax.block_until_ready(build_lbvh(self.triangles))
        else:
            self.bvh = None  # degenerate: brute force

    def cast(self, origins, directions) -> RayHits:
        o = jnp.asarray(origins, jnp.float32).reshape(-1, 3)
        d = jnp.asarray(directions, jnp.float32).reshape(-1, 3)
        self._debug_check_rays(o, d)
        if self.bvh is None:
            return _cast_bruteforce(
                self.triangles, o, d, jnp.float32(self.max_dist), 8
            )
        depth, leaf = cast_rays(self.bvh, o, d, jnp.float32(self.max_dist))
        hit = leaf >= 0
        safe_leaf = jnp.maximum(leaf, 0)
        n = tri_ops.normals(self.bvh.tris_sorted[safe_leaf])
        normals = jnp.where(hit[:, None], n, 0.0)
        face_id = jnp.where(hit, self.bvh.prim_order[safe_leaf], -1)
        return RayHits(depth, normals, face_id)

"""30-bit 3-D Morton codes (bit-interleaved quantised coordinates).

The TPU-native BVH builds from Morton-sorted primitives (LBVH), replacing the
reference's serial CPU nth_element median-split build (reference:
src/prim3d/Geometry/bvh.cu:209-300) with a fully parallel on-device pipeline.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def expand_bits(v: Array) -> Array:
    """Spread the low 10 bits of v so there are 2 zero bits between each."""
    v = v.astype(jnp.uint32)
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def morton3d(points: Array, lo: Array, hi: Array) -> Array:
    """Morton codes (uint32) of points (..., 3) within bbox [lo, hi]."""
    extent = jnp.maximum(hi - lo, 1e-30)
    q = jnp.clip((points - lo) / extent, 0.0, 1.0) * 1023.0
    q = jnp.clip(q, 0.0, 1023.0).astype(jnp.uint32)
    x = expand_bits(q[..., 0])
    y = expand_bits(q[..., 1])
    z = expand_bits(q[..., 2])
    return (x << 2) | (y << 1) | z

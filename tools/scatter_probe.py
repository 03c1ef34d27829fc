"""Compare scatter-add strategies at flagship-backward scale on the chip.

The diff-cast backward transposes a (R=2M, 4) gather into a (T=426k, 4)
scatter-add. XLA TPU scatter with duplicate indices can serialize; this
probe measures the alternatives so the pipeline picks the fastest.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/prim3d_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from tools.flagship_probe import slope_time

R, T = 2_088_960, 425_984


def main():
    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)
    prim = jnp.asarray(rng.integers(0, T, R), jnp.int32)
    g = jnp.asarray(rng.standard_normal((R, 4)), jnp.float32)

    @jax.jit
    def scatter_plain(g, prim):
        return jnp.zeros((T, 4), jnp.float32).at[prim].add(g)

    @jax.jit
    def scatter_sorted(g, prim):
        order = jnp.argsort(prim)
        ps = prim[order]
        gs = g[order]
        return jnp.zeros((T, 4), jnp.float32).at[ps].add(
            gs, indices_are_sorted=True)

    @jax.jit
    def seg_sorted(g, prim):
        order = jnp.argsort(prim)
        return jax.ops.segment_sum(
            g[order], prim[order], num_segments=T, indices_are_sorted=True)

    @jax.jit
    def unique_scatter(g, prim):
        # speed floor check: scatter with UNIQUE indices (take first R<T
        # rows as distinct targets)
        idx = jnp.arange(T, dtype=jnp.int32)
        return jnp.zeros((T, 4), jnp.float32).at[idx].add(
            g[:T], unique_indices=True, indices_are_sorted=True)

    @jax.jit
    def sorted_cumsum(g, prim):
        # segment sums without ANY duplicate-index scatter: sort by prim,
        # cumsum, take per-segment deltas via two unique-index scatters
        ps, g0, g1, g2, g3 = jax.lax.sort(
            (prim, g[:, 0], g[:, 1], g[:, 2], g[:, 3]), num_keys=1)
        gs = jnp.stack([g0, g1, g2, g3], -1)
        cs = jnp.cumsum(gs, axis=0)
        is_end = jnp.concatenate(
            [ps[1:] != ps[:-1], jnp.ones((1,), bool)])
        is_start = jnp.concatenate(
            [jnp.ones((1,), bool), ps[1:] != ps[:-1]])
        pe = jnp.where(is_end, ps, T)  # unique (pad row T)
        pb = jnp.where(is_start, ps, T)
        zero = jnp.zeros((T + 1, 4), jnp.float32)
        s_end = zero.at[pe].add(jnp.where(is_end[:, None], cs, 0),
                                unique_indices=True)
        s_pre = zero.at[pb].add(
            jnp.where(is_start[:, None], cs - gs, 0), unique_indices=True)
        return (s_end - s_pre)[:T]

    for name, fn in [("plain .at[].add", scatter_plain),
                     ("argsort + sorted add", scatter_sorted),
                     ("argsort + segment_sum", seg_sorted),
                     ("unique-index scatter (floor)", unique_scatter),
                     ("sort + cumsum + unique deltas", sorted_cumsum)]:
        out = fn(g, prim)
        dt = slope_time(lambda fn=fn: fn(g, prim), 5)
        print(f"{name}: {dt*1e3:.1f} ms (checksum {float(out.sum()):.1f})",
              flush=True)


if __name__ == "__main__":
    main()

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

    for name, fn in [("plain .at[].add", scatter_plain),
                     ("argsort + sorted add", scatter_sorted),
                     ("argsort + segment_sum", seg_sorted)]:
        out = fn(g, prim)
        dt = slope_time(lambda fn=fn: fn(g, prim), 5)
        print(f"{name}: {dt*1e3:.1f} ms (checksum {float(out.sum()):.1f})",
              flush=True)


if __name__ == "__main__":
    main()

"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
exercised without a pod (SURVEY.md §4: the reference has no tests at all; this
harness is new design). Must set XLA flags before jax initialises.
"""
import os

# Force CPU: the ambient environment may point JAX at a (remote, slow-compile)
# TPU via JAX_PLATFORMS=axon; tests always run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = os.environ.get("PRIM3D_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compilation cache: shape-heavy tests (many grid sizes/capacities)
# would otherwise pay tens of seconds of XLA compile on every run.
jax.config.update("jax_compilation_cache_dir", "/tmp/prim3d_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
exercised without a pod (SURVEY.md §4: the reference has no tests at all; this
harness is new design).

NOTE: the ambient environment pre-imports jax via /root/.axon_site's
sitecustomize and points it at a remote TPU (JAX_PLATFORMS=axon), so setting
env vars here is too late — we must go through jax.config, which takes effect
at (lazy) backend initialisation.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (usually already imported by sitecustomize)

jax.config.update("jax_platforms", os.environ.get("PRIM3D_TEST_PLATFORM", "cpu"))
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compilation cache: shape-heavy tests (many grid sizes/capacities)
# would otherwise pay tens of seconds of XLA compile on every run.
jax.config.update("jax_compilation_cache_dir", "/tmp/prim3d_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

"""primitive3d_tpu — TPU-native 3D geometry processing in JAX/XLA/Pallas.

A from-scratch framework with the capabilities of lzhnb/Primitive3D (marching
cubes, marching tetrahedra, ray casting against triangle meshes, PLY export),
redesigned TPU-first: pure-XLA + Pallas compute, jnp.cumsum prefix-scan
compaction instead of CUDA atomics, jax.sharding for multi-chip scale-out.

Public API mirrors the reference's surface (reference: prim3d/__init__.py:2-16).
"""
from .core.config import Config, MarchingCubesConfig, RayCastConfig
from .core.timer import Timer, TimerError, time_fn
from .core.grid import scale_to_bound
from .io.ply import load_mesh, save_mesh
from .raycast import RayHits, available_backends, create_raycaster
from .ops.marching_cubes import (
    MCResult,
    MCSoupResult,
    marching_cubes,
    marching_cubes_counts,
    marching_cubes_padded,
    marching_cubes_soup,
)
from .ops.marching_tetrahedra import (
    MTResult,
    grid_tetrahedra,
    marching_tetrahedra,
    marching_tetrahedra_lattice,
    marching_tetrahedra_padded,
)
from .version import __version__

# Reference-compatible alias (the reference spells it "tetrahedras",
# prim3d/__init__.py:5-6).
marching_tetrahedras = marching_tetrahedra

__all__ = [
    "__version__",
    "Config",
    "RayCastConfig",
    "MarchingCubesConfig",
    "RayHits",
    "available_backends",
    "create_raycaster",
    "Timer",
    "TimerError",
    "time_fn",
    "scale_to_bound",
    "save_mesh",
    "load_mesh",
    "MCResult",
    "MCSoupResult",
    "marching_cubes",
    "marching_cubes_counts",
    "marching_cubes_padded",
    "marching_cubes_soup",
    "MTResult",
    "grid_tetrahedra",
    "marching_tetrahedra",
    "marching_tetrahedras",
    "marching_tetrahedra_lattice",
    "marching_tetrahedra_padded",
]

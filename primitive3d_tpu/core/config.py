"""Runtime configuration (dataclasses, not compile-time defines).

The reference's knobs are compile-time or hard-coded: the ENABLE_OPTIX CMake
define selecting the ray backend (reference: CMakeLists.txt:30-39), leaf size
8 (ray_cast.cu:374), 1024 threads/block (Core/utils.h:19), 8^3 blocks
(marching_cubes.cu:234). Here every knob is a runtime value with a measured
default, consumed by the factories:

    cfg = Config(raycast=RayCastConfig(backend="bruteforce"))
    rc = create_raycaster(v, f, config=cfg.raycast)
    res = marching_cubes_padded(grid, 0.0, config=cfg.marching_cubes)

Explicit keyword arguments always override config fields.
"""
from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class RayCastConfig:
    # "auto" resolves to the Pallas cluster kernel on TPU and the all-pairs
    # MXU cast elsewhere (raycast.create_raycaster)
    backend: str = "auto"  # auto | pallas | mxu | bvh | bruteforce
    max_dist: float = 10.0  # reference MAX_DIST parity (bvh.cu:13)
    cluster_size: Optional[int] = None  # pallas cluster width; None = auto
    # (128 -> one VPU lane row; meshes past ~500k tris auto-pick 256:
    # fatter clusters amortize the stream tier's per-entry fixed costs,
    # measured +28% at 1.7M tris)
    mxu_chunk: int = 512  # triangles per MXU tile (all-pairs backend)
    # mesh-size tiers of the pallas backend (see PallasRayCaster)
    mxu_max_tris: int = 32_000  # VMEM-resident Plücker tensor
    mxu_stream_max_tris: Optional[int] = None  # HBM-streamed tier;
    # None = 32767 * cluster_size (the work-word id limit): 4.2M tris
    # at S=128, 8.4M at S=256 (384 B/tri of HBM either way)
    # opt-in watertight shared-edge handling: exactly-zero Plücker side
    # products (ray through a shared edge) count as agreeing with any
    # sign instead of as +0/-0 signs (see raycast.py module docstring)
    edge_wildcard: bool = False


@dataclasses.dataclass(frozen=True)
class MarchingCubesConfig:
    # None -> exact-size eager API computes counts first (like the
    # reference's count pass + readback); set capacities for jit pipelines.
    vert_capacity: Optional[int] = None
    face_capacity: Optional[int] = None
    vert_units: int = 0  # compaction unit budgets (0 = derived)
    cube_units: int = 0
    active_capacity: int = 0  # active-cube budget (0 = face_capacity)


@dataclasses.dataclass(frozen=True)
class Config:
    raycast: RayCastConfig = dataclasses.field(default_factory=RayCastConfig)
    marching_cubes: MarchingCubesConfig = dataclasses.field(
        default_factory=MarchingCubesConfig
    )


DEFAULT = Config()

"""Runtime configuration (dataclasses, not compile-time defines).

The reference's knobs are compile-time or hard-coded: the ENABLE_OPTIX CMake
define selecting the ray backend (reference: CMakeLists.txt:30-39), leaf size
8 (ray_cast.cu:374), 1024 threads/block (Core/utils.h:19), 8^3 blocks
(marching_cubes.cu:234). Here every knob is a runtime value with a measured
default; pass a ``Config`` (or rely on module defaults) instead of rebuilding.
"""
from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class RayCastConfig:
    backend: str = "pallas"  # pallas | mxu | bvh | bruteforce
    max_dist: float = 10.0  # reference MAX_DIST parity (bvh.cu:13)
    cluster_size: int = 128  # pallas leaf width (one VPU lane row)
    mxu_chunk: int = 512  # triangles per MXU tile


@dataclasses.dataclass(frozen=True)
class MarchingCubesConfig:
    # None -> exact-size eager API computes counts first (like the
    # reference's count pass + readback); set capacities for jit pipelines.
    vert_capacity: Optional[int] = None
    face_capacity: Optional[int] = None
    cumsum_block: int = 4096


@dataclasses.dataclass(frozen=True)
class Config:
    raycast: RayCastConfig = dataclasses.field(default_factory=RayCastConfig)
    marching_cubes: MarchingCubesConfig = dataclasses.field(
        default_factory=MarchingCubesConfig
    )


DEFAULT = Config()

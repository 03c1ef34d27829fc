"""ctypes bindings for the native host runtime (native/prim3d_native.cpp).

Auto-builds ``libprim3d_native.so`` with the repo Makefile on first use if the
binary is missing (g++ is assumed present; any failure degrades gracefully —
``available()`` returns False and callers fall back to the pure-Python/JAX
paths). The native LBVH emits the exact struct-of-arrays layout of
bvh/lbvh.py's ``LBVH``, so device traversals can consume a host-built tree.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native"
)
_SO = os.path.join(_DIR, "libprim3d_native.so")
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_SO):
            subprocess.run(
                ["make", "-C", _DIR], check=True, capture_output=True
            )
        lib = ctypes.CDLL(_SO)
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C")
        lib.p3d_build_lbvh.restype = ctypes.c_int
        lib.p3d_build_lbvh.argtypes = [
            f32p, ctypes.c_int32, i32p, i32p, f32p, f32p, i32p, i32p, i32p, f32p,
        ]
        lib.p3d_raycast.restype = None
        lib.p3d_raycast.argtypes = [
            i32p, i32p, f32p, f32p, i32p, i32p, i32p, f32p, ctypes.c_int32,
            f32p, f32p, ctypes.c_int32, ctypes.c_float, f32p, f32p, i32p,
        ]
        lib.p3d_save_ply.restype = ctypes.c_int
        lib.p3d_save_ply.argtypes = [
            ctypes.c_char_p, f32p, u8p, ctypes.c_int32, i32p, ctypes.c_int32,
        ]
        _lib = lib
    except Exception:  # noqa: BLE001 — any failure => pure-Python fallback
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def build_lbvh(tris: np.ndarray):
    """Host-parallel LBVH build; returns the bvh/lbvh.py LBVH struct arrays.

    tris: (T, 3, 3) float32. Returns an ``LBVH`` namedtuple (numpy arrays).
    """
    from .bvh.lbvh import LBVH

    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    tris = np.ascontiguousarray(tris, np.float32)
    T = tris.shape[0]
    left = np.empty(T - 1, np.int32)
    right = np.empty(T - 1, np.int32)
    box_lo = np.empty((T - 1, 3), np.float32)
    box_hi = np.empty((T - 1, 3), np.float32)
    escape = np.empty(T - 1, np.int32)
    escape_leaf = np.empty(T, np.int32)
    prim_order = np.empty(T, np.int32)
    tris_sorted = np.empty((T, 3, 3), np.float32)
    rc = lib.p3d_build_lbvh(
        tris.reshape(-1, 9), T, left, right,
        box_lo.reshape(-1), box_hi.reshape(-1), escape, escape_leaf,
        prim_order, tris_sorted.reshape(-1, 9),
    )
    if rc != 0:
        raise ValueError(f"p3d_build_lbvh failed: {rc}")
    return LBVH(left, right, box_lo, box_hi, escape, escape_leaf,
                tris_sorted, prim_order)


def raycast(bvh, origins, dirs, max_dist: float = 10.0):
    """Threaded CPU closest-hit cast over a (numpy) LBVH."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    o = np.ascontiguousarray(origins, np.float32).reshape(-1, 3)
    d = np.ascontiguousarray(dirs, np.float32).reshape(-1, 3)
    R = o.shape[0]
    T = np.asarray(bvh.tris_sorted).shape[0]
    depth = np.empty(R, np.float32)
    normals = np.empty((R, 3), np.float32)
    face_id = np.empty(R, np.int32)
    lib.p3d_raycast(
        np.ascontiguousarray(bvh.left, np.int32),
        np.ascontiguousarray(bvh.right, np.int32),
        np.ascontiguousarray(bvh.box_lo, np.float32).reshape(-1),
        np.ascontiguousarray(bvh.box_hi, np.float32).reshape(-1),
        np.ascontiguousarray(bvh.escape, np.int32),
        np.ascontiguousarray(bvh.escape_leaf, np.int32),
        np.ascontiguousarray(bvh.prim_order, np.int32),
        np.ascontiguousarray(bvh.tris_sorted, np.float32).reshape(-1, 9),
        T, o, d, R, float(max_dist), depth, normals, face_id,
    )
    return depth, normals, face_id


def save_ply(filename, vertices, faces, colors=None) -> None:
    """Native binary PLY writer (same format as io/ply.py)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    v = np.ascontiguousarray(vertices, np.float32).reshape(-1, 3)
    f = np.ascontiguousarray(faces, np.int32).reshape(-1, 3)
    if colors is None:
        c = np.full((v.shape[0], 3), 127, np.uint8)
    else:
        c = np.ascontiguousarray(colors, np.uint8).reshape(-1, 3)
    rc = lib.p3d_save_ply(str(filename).encode(), v, c, v.shape[0], f, f.shape[0])
    if rc != 0:
        raise IOError(f"p3d_save_ply failed: {rc}")

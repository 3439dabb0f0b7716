"""ctypes bindings for the native asset library (native/assetlib.cpp).

The reference's runtime layer is C (vulkan_basics.c / scene.c /
textures.c); ours keeps the same split: JAX for device compute, this
native library for host-side asset hot loops (BC decode, dequantization,
Morton codes, BVH AABB reductions). Every entry point has a numpy
fallback, selected automatically when the library is missing.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _library():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    root = os.path.abspath(os.path.join(os.path.dirname(__file__),
                                        "..", ".."))
    path = os.path.join(root, "native", "libassetlib.so")
    if not os.path.exists(path):
        # Build on first use (g++ is part of the baked toolchain).
        import subprocess
        try:
            subprocess.run(["sh", os.path.join(root, "native", "build.sh")],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.decode_bc1.argtypes = [u8p, ctypes.c_int, ctypes.c_int, f32p]
    lib.decode_bc5.argtypes = [u8p, ctypes.c_int, ctypes.c_int, f32p]
    lib.dequantize_positions.argtypes = [u32p, ctypes.c_int64, f32p, f32p,
                                         f32p]
    lib.morton_codes.argtypes = [f32p, ctypes.c_int64, f32p, f32p, u64p]
    lib.bvh_leaf_aabbs.argtypes = [f32p, f32p, ctypes.c_int64,
                                   ctypes.c_int64, ctypes.c_int, f32p, f32p]
    lib.bvh_reduce_level.argtypes = [f32p, f32p, ctypes.c_int64, f32p, f32p]
    _LIB = lib
    return lib


def available() -> bool:
    return _library() is not None


def _ptr(array: np.ndarray, ctype):
    return array.ctypes.data_as(ctypes.POINTER(ctype))


def decode_bc1(raw: np.ndarray, width: int, height: int):
    lib = _library()
    if lib is None:
        return None
    raw = np.ascontiguousarray(raw, np.uint8)
    out = np.empty((height, width, 3), np.float32)
    lib.decode_bc1(_ptr(raw, ctypes.c_uint8), width, height,
                   _ptr(out, ctypes.c_float))
    return out


def decode_bc5(raw: np.ndarray, width: int, height: int):
    lib = _library()
    if lib is None:
        return None
    raw = np.ascontiguousarray(raw, np.uint8)
    out = np.empty((height, width, 2), np.float32)
    lib.decode_bc5(_ptr(raw, ctypes.c_uint8), width, height,
                   _ptr(out, ctypes.c_float))
    return out


def dequantize_positions(packed: np.ndarray, factor: np.ndarray,
                         summand: np.ndarray):
    lib = _library()
    if lib is None:
        return None
    packed = np.ascontiguousarray(packed, np.uint32)
    count = packed.shape[0]
    out = np.empty((count, 3), np.float32)
    lib.dequantize_positions(
        _ptr(packed, ctypes.c_uint32), count,
        _ptr(np.ascontiguousarray(factor, np.float32), ctypes.c_float),
        _ptr(np.ascontiguousarray(summand, np.float32), ctypes.c_float),
        _ptr(out, ctypes.c_float))
    return out


def morton_codes(tris: np.ndarray, box_min: np.ndarray, box_max: np.ndarray):
    lib = _library()
    if lib is None:
        return None
    tris = np.ascontiguousarray(tris, np.float32)
    out = np.empty(tris.shape[0], np.uint64)
    lib.morton_codes(
        _ptr(tris, ctypes.c_float), tris.shape[0],
        _ptr(np.ascontiguousarray(box_min, np.float32), ctypes.c_float),
        _ptr(np.ascontiguousarray(box_max, np.float32), ctypes.c_float),
        _ptr(out, ctypes.c_uint64))
    return out


def bvh_leaf_aabbs(tri_lo: np.ndarray, tri_hi: np.ndarray,
                   padded_leaves: int, leaf_size: int):
    lib = _library()
    if lib is None:
        return None
    tri_lo = np.ascontiguousarray(tri_lo, np.float32)
    tri_hi = np.ascontiguousarray(tri_hi, np.float32)
    leaf_lo = np.empty((padded_leaves, 3), np.float32)
    leaf_hi = np.empty((padded_leaves, 3), np.float32)
    lib.bvh_leaf_aabbs(_ptr(tri_lo, ctypes.c_float),
                       _ptr(tri_hi, ctypes.c_float), tri_lo.shape[0],
                       padded_leaves, leaf_size,
                       _ptr(leaf_lo, ctypes.c_float),
                       _ptr(leaf_hi, ctypes.c_float))
    return leaf_lo, leaf_hi

"""ctypes bindings for the native host runtime (livo_host.cc).

Builds the shared library on demand with g++ (cached next to the source);
every entry point has a NumPy fallback so the package works without a
toolchain (the fallback is exercised in tests for equivalence).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "src", "livo_host.cc")
_LIB = os.path.join(os.path.dirname(__file__), "liblivo_host.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


class RecordIndex(ctypes.Structure):
    _fields_ = [
        ("type", ctypes.c_uint8),
        ("offset", ctypes.c_uint64),
        ("stamp", ctypes.c_double),
        ("count", ctypes.c_uint32),
    ]


def _build() -> bool:
    try:
        subprocess.run(
            [
                "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                "-o", _LIB, _SRC,
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried:
        return None
    _tried = True
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None

    lib.flvo_index.restype = ctypes.c_int64
    lib.flvo_index.argtypes = [
        ctypes.c_char_p, ctypes.c_uint64,
        ctypes.POINTER(RecordIndex), ctypes.c_uint64,
    ]
    lib.flvo_decode_lidar.restype = ctypes.c_int64
    lib.flvo_decode_lidar.argtypes = [
        ctypes.c_char_p, ctypes.c_uint64,
        ctypes.c_float, ctypes.c_float, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.flvo_decode_imu.restype = None
    lib.flvo_decode_imu.argtypes = [
        ctypes.c_char_p, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
    ]
    lib.flvo_decode_image.restype = None
    lib.flvo_decode_image.argtypes = [
        ctypes.c_char_p, ctypes.c_uint64, ctypes.POINTER(ctypes.c_uint8)
    ]
    lib.flvo_voxel_mask.restype = ctypes.c_int64
    lib.flvo_voxel_mask.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    _lib = lib
    return lib


def voxel_mask(pts: np.ndarray, leaf: float) -> np.ndarray:
    """First-point-per-voxel boolean mask. Native when available."""
    pts = np.ascontiguousarray(pts, np.float32)
    lib = get_lib()
    if lib is not None:
        mask = np.zeros(len(pts), np.uint8)
        lib.flvo_voxel_mask(
            pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(pts),
            leaf,
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return mask.astype(bool)
    # NumPy fallback: first occurrence per voxel key (order-stable).
    key = np.floor(pts / leaf).astype(np.int64)
    _, first = np.unique(key, axis=0, return_index=True)
    mask = np.zeros(len(pts), bool)
    mask[first] = True
    return mask

"""ctypes loader + on-demand build for the native extraction components."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "connect_points.cpp")
_LIB = os.path.join(_HERE, "_emap_native.so")

_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _LIB,
    ]
    try:
        subprocess.run(
            cmd, check=True, capture_output=True, text=True, timeout=120
        )
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _build_failed = True
            return None
        lib.emap_connect_points.restype = ctypes.c_int
        lib.emap_connect_points.argtypes = [
            ctypes.POINTER(ctypes.c_double),  # pts
            ctypes.c_int64,                   # n
            ctypes.c_double,                  # distance_threshold
            ctypes.c_double,                  # angle_threshold
            ctypes.c_double,                  # nms_factor
            ctypes.c_int,                     # keep_short_lines
            ctypes.c_uint64,                  # seed
            ctypes.POINTER(ctypes.c_int32),   # out_indices
            ctypes.POINTER(ctypes.c_int64),   # out_offsets
            ctypes.POINTER(ctypes.c_int64),   # n_polylines
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def connect_points_native(
    points_wld: np.ndarray,
    distance_threshold: float,
    angle_threshold: float,
    nms_factor: float,
    keep_short_lines: bool,
    seed: int = 0,
):
    """Grid-hashed greedy polyline growth; returns a list of index lists.
    Same attachment/NMS/stop rules as fitting.connect_points (growth-seed
    randomization differs in RNG sequence only)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")

    pts = np.ascontiguousarray(points_wld, dtype=np.float64)
    n = len(pts)
    out_indices = np.empty(max(n, 1), dtype=np.int32)
    out_offsets = np.zeros(n + 1, dtype=np.int64)
    n_poly = ctypes.c_int64(0)
    rc = lib.emap_connect_points(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(n),
        ctypes.c_double(distance_threshold),
        ctypes.c_double(angle_threshold),
        ctypes.c_double(nms_factor),
        ctypes.c_int(1 if keep_short_lines else 0),
        ctypes.c_uint64(seed),
        out_indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.byref(n_poly),
    )
    if rc != 0:
        raise RuntimeError(f"emap_connect_points failed with code {rc}")
    k = n_poly.value
    return [
        out_indices[out_offsets[i] : out_offsets[i + 1]].tolist()
        for i in range(k)
    ]

"""ctypes bindings for the native host geometry library.

Compiles ``csrc/geometry.cpp`` lazily with g++ on first use (cached as a
shared library next to the source); falls back gracefully (``available() ->
False``) when no compiler is present so every caller has a numpy path.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), 'csrc', 'geometry.cpp')
_SO = os.path.join(os.path.dirname(__file__), 'csrc', '_geometry.so')


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ['g++', '-O3', '-march=native', '-shared', '-fPIC',
                     '-o', _SO, _SRC],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(_SO)
            f32p = ctypes.POINTER(ctypes.c_float)
            i32p = ctypes.POINTER(ctypes.c_int32)
            lib.boxes_iou_bev_cpu.argtypes = [f32p, ctypes.c_int64, f32p, ctypes.c_int64, f32p]
            lib.boxes_iou3d_cpu.argtypes = [f32p, ctypes.c_int64, f32p, ctypes.c_int64, f32p]
            lib.points_in_boxes_cpu_kernel.argtypes = [f32p, ctypes.c_int64, f32p, ctypes.c_int64, i32p]
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def available():
    return _load() is not None


def _f32(x):
    return np.ascontiguousarray(x, dtype=np.float32)


def boxes_iou_bev(boxes_a, boxes_b):
    lib = _load()
    a, b = _f32(boxes_a), _f32(boxes_b)
    out = np.zeros((a.shape[0], b.shape[0]), dtype=np.float32)
    lib.boxes_iou_bev_cpu(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), a.shape[0],
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), b.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def boxes_iou3d(boxes_a, boxes_b):
    lib = _load()
    a, b = _f32(boxes_a), _f32(boxes_b)
    out = np.zeros((a.shape[0], b.shape[0]), dtype=np.float32)
    lib.boxes_iou3d_cpu(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), a.shape[0],
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), b.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def points_in_boxes(points, boxes):
    lib = _load()
    p, b = _f32(points), _f32(boxes)
    out = np.zeros((b.shape[0], p.shape[0]), dtype=np.int32)
    lib.points_in_boxes_cpu_kernel(
        p.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), p.shape[0],
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), b.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out

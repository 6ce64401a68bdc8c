"""ctypes bindings for the native host ops (csrc/host_ops.cpp).

Compiled lazily with g++ on first use; the .so is cached next to the source.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

_SRC = Path(__file__).resolve().parent.parent / "csrc" / "host_ops.cpp"
_SO = _SRC.parent / "libhost_ops.so"
_lock = threading.Lock()
_lib = None


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            subprocess.check_call(
                ["g++", "-O3", "-shared", "-fPIC", str(_SRC), "-o", str(_SO)]
            )
        lib = ctypes.CDLL(str(_SO))
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.boxes_iou_bev.argtypes = [f32p, ctypes.c_int, f32p, ctypes.c_int, f32p]
        lib.boxes_iou_3d.argtypes = [f32p, ctypes.c_int, f32p, ctypes.c_int, f32p]
        lib.points_in_boxes.argtypes = [f32p, ctypes.c_int, f32p, ctypes.c_int, i32p]
        lib.nms_bev.argtypes = [f32p, f32p, ctypes.c_int, ctypes.c_float, i32p]
        lib.nms_bev.restype = ctypes.c_int
        _lib = lib
        return lib


def _c7(boxes):
    return np.ascontiguousarray(boxes[:, :7], np.float32)


def boxes_iou_bev(boxes_a: np.ndarray, boxes_b: np.ndarray) -> np.ndarray:
    lib = _load()
    a, b = _c7(boxes_a), _c7(boxes_b)
    out = np.zeros((len(a), len(b)), np.float32)
    if len(a) and len(b):
        lib.boxes_iou_bev(a, len(a), b, len(b), out)
    return out


def boxes_iou_3d(boxes_a: np.ndarray, boxes_b: np.ndarray) -> np.ndarray:
    lib = _load()
    a, b = _c7(boxes_a), _c7(boxes_b)
    out = np.zeros((len(a), len(b)), np.float32)
    if len(a) and len(b):
        lib.boxes_iou_3d(a, len(a), b, len(b), out)
    return out


def points_in_boxes(points_xyz: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    """-> (N,) int32 index of first containing box, -1 outside."""
    lib = _load()
    p = np.ascontiguousarray(points_xyz[:, :3], np.float32)
    b = _c7(boxes)
    out = np.full(len(p), -1, np.int32)
    if len(p) and len(b):
        lib.points_in_boxes(p, len(p), b, len(b), out)
    return out


def nms_bev(boxes: np.ndarray, scores: np.ndarray, thresh: float) -> np.ndarray:
    lib = _load()
    b = _c7(boxes)
    s = np.ascontiguousarray(scores, np.float32)
    keep = np.zeros(len(b), np.int32)
    nk = lib.nms_bev(b, s, len(b), float(thresh), keep)
    return keep[:nk]

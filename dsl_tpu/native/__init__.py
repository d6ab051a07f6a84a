"""Native (C++) host ops with lazy build + ctypes binding + numpy fallback.

``get_lib()`` returns the loaded shared library or None; callers fall back
to numpy implementations when the toolchain is unavailable. The build is a
single g++ invocation cached next to the source.
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
import threading

import numpy as np

_HERE = osp.dirname(osp.abspath(__file__))
_SRC = osp.join(_HERE, "src", "dslnative.cpp")
_LIB_PATH = osp.join(_HERE, "build", "libdslnative.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    os.makedirs(osp.dirname(_LIB_PATH), exist_ok=True)
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           "-o", _LIB_PATH, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired):
        return False


def get_lib():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not osp.exists(_LIB_PATH) or (
                osp.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_LIB_PATH)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int32)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.dsl_nms.restype = ctypes.c_int
        lib.dsl_nms.argtypes = [f32p, f32p, ctypes.c_int, ctypes.c_float,
                                ctypes.c_float, i32p]
        lib.dsl_batched_nms.restype = ctypes.c_int
        lib.dsl_batched_nms.argtypes = [f32p, f32p, i32p, ctypes.c_int,
                                        ctypes.c_int, ctypes.c_float,
                                        ctypes.c_float, i32p]
        lib.dsl_normalize_pad.restype = None
        lib.dsl_normalize_pad.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                          f32p, f32p, ctypes.c_int, f32p,
                                          ctypes.c_int, ctypes.c_int]
        lib.dsl_iou_matrix.restype = None
        lib.dsl_iou_matrix.argtypes = [f32p, ctypes.c_int, f32p,
                                       ctypes.c_int, f32p]
        _lib = lib
        return _lib


def _f32(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i32(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _u8(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def native_nms(boxes: np.ndarray, scores: np.ndarray, iou_threshold: float,
               score_threshold: float = 0.0) -> np.ndarray | None:
    """Returns kept indices (score-desc) or None if the lib is unavailable."""
    lib = get_lib()
    if lib is None or len(boxes) == 0:
        return None if lib is None else np.zeros((0,), np.int64)
    boxes = np.ascontiguousarray(boxes, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    keep = np.empty((len(boxes),), np.int32)
    n = lib.dsl_nms(_f32(boxes), _f32(scores), len(boxes),
                    float(iou_threshold), float(score_threshold), _i32(keep))
    return keep[:n].astype(np.int64)


def native_batched_nms(boxes, scores, cids, num_classes, iou_threshold,
                       score_threshold=0.0) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    if len(boxes) == 0:
        return np.zeros((0,), np.int64)
    boxes = np.ascontiguousarray(boxes, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    cids = np.ascontiguousarray(cids, np.int32)
    keep = np.empty((len(boxes),), np.int32)
    n = lib.dsl_batched_nms(_f32(boxes), _f32(scores), _i32(cids),
                            len(boxes), int(num_classes),
                            float(iou_threshold), float(score_threshold),
                            _i32(keep))
    return keep[:n].astype(np.int64)


def native_normalize_pad(img: np.ndarray, mean, std, to_rgb: bool,
                         canvas_hw) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.uint8)
    ch, cw = canvas_hw
    out = np.empty((ch, cw, 3), np.float32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    lib.dsl_normalize_pad(_u8(img), img.shape[0], img.shape[1], _f32(mean),
                          _f32(std), int(bool(to_rgb)), _f32(out), ch, cw)
    return out


def native_iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    a = np.ascontiguousarray(a, np.float32)
    b = np.ascontiguousarray(b, np.float32)
    out = np.empty((len(a), len(b)), np.float32)
    lib.dsl_iou_matrix(_f32(a), len(a), _f32(b), len(b), _f32(out))
    return out

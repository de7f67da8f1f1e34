"""ctypes bindings for the native host kernels (native/kitti_native.cpp).

The .so is optional: `available()` is False until `native/build.sh` has run,
and every caller has a pure-python fallback (PIL warp in the dataset, numpy
rotated IoU in the evaluator).  ctypes releases the GIL during the calls, so
the threaded loader gets real parallelism out of the C++ warp.
"""

import ctypes
import os

import numpy as np

_LIB = None
_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "native", "libkitti_native.so",
)


def _load():
    global _LIB
    if _LIB is None and os.path.exists(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        lib.warp_affine_normalize.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ]
        lib.rotated_iou.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ]
        _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def warp_affine_normalize(src: np.ndarray, trans_inv: np.ndarray,
                          dst_w: int, dst_h: int,
                          mean: np.ndarray, std: np.ndarray) -> np.ndarray:
    """uint8 [H, W, 3] -> float32 [dst_h, dst_w, 3] warped + normalized."""
    lib = _load()
    src = np.ascontiguousarray(src, np.uint8)
    inv = np.ascontiguousarray(trans_inv, np.float64)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    out = np.empty((dst_h, dst_w, 3), np.float32)
    lib.warp_affine_normalize(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        src.shape[0], src.shape[1],
        inv.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        dst_h, dst_w,
        mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def rotated_iou(boxes: np.ndarray, qboxes: np.ndarray,
                criterion: int = -1) -> np.ndarray:
    lib = _load()
    boxes = np.ascontiguousarray(boxes, np.float64)
    qboxes = np.ascontiguousarray(qboxes, np.float64)
    n, m = len(boxes), len(qboxes)
    out = np.empty((n, m), np.float32)
    if n and m:
        lib.rotated_iou(
            boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
            qboxes.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), m,
            criterion, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
    return out

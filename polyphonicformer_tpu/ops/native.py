"""ctypes bindings for the native host library (native/libpolynative.so).

Provides the C++ Jonker-Volgenant LSA solver and the VPQ statistics core.
Falls back to the pure-Python implementations when the library has not been
built (``make -C native``); ``build()`` compiles it on demand.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libpolynative.so")
_lib: Optional[ctypes.CDLL] = None


def build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        if not build():
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.lsap_solve.restype = ctypes.c_int
    lib.lsap_solve.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int)]
    lib.vpq_stats.restype = ctypes.c_int
    lib.vpq_stats.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.c_int, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double)]
    lib.depth_void_mask.restype = None
    lib.depth_void_mask.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_double,
        ctypes.c_int, ctypes.c_int64]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def lsap_solve(cost: np.ndarray) -> Optional[np.ndarray]:
    """Solve rectangular LSA (rows <= cols). Returns row2col or None if the
    native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    cost = np.ascontiguousarray(cost, np.float32)
    n_rows, n_cols = cost.shape
    out = np.empty((n_rows,), np.int32)
    rc = lib.lsap_solve(cost.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                        n_rows, n_cols,
                        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    if rc != 0:
        raise RuntimeError(f"lsap_solve failed rc={rc}")
    return out


def vpq_stats(pred: np.ndarray, gt: np.ndarray, num_classes: int = 19,
              max_ins: int = 10000, ign_id: int = 255
              ) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
    lib = _load()
    if lib is None:
        return None
    pred = np.ascontiguousarray(pred.reshape(-1), np.int64)
    gt = np.ascontiguousarray(gt.reshape(-1), np.int64)
    n = num_classes + 1
    iou = np.zeros(n, np.float64)
    tp = np.zeros(n, np.float64)
    fn = np.zeros(n, np.float64)
    fp = np.zeros(n, np.float64)
    rc = lib.vpq_stats(
        pred.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        gt.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        pred.size, num_classes, max_ins, ign_id,
        iou.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        tp.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        fn.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        fp.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if rc != 0:
        raise RuntimeError(f"vpq_stats failed rc={rc}")
    return iou, tp, fn, fp


def depth_void_mask(pred: np.ndarray, pred_depth: np.ndarray,
                    gt_depth: np.ndarray, thr: float, num_classes: int = 19,
                    max_ins: int = 10000) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    out = np.ascontiguousarray(pred.reshape(-1), np.int64).copy()
    pd = np.ascontiguousarray(pred_depth.reshape(-1), np.float32)
    gd = np.ascontiguousarray(gt_depth.reshape(-1), np.float32)
    lib.depth_void_mask(
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        pd.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        gd.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.size, thr, num_classes, max_ins)
    return out.reshape(pred.shape)

"""NMS front-end: C++ native kernels (ctypes), jit-able on-device NMS, and a
numpy fallback.

The reference builds a Cython ``cpu_nms`` at W0 time (00_align_face.sh:12;
``cpu_nms.pyx``) plus a vestigial CUDA bitmask kernel.  Here:

* ``greedy_nms`` / ``soft_nms`` / ``bitmask_nms`` dispatch to the C++ shared
  library (``celebbasis_tpu/native/nms.cpp``), compiled on first use with
  g++ (no pybind11 — plain C ABI via ctypes);
* ``nms_jax`` is a fixed-shape ``lax.while_loop`` formulation for on-device
  use inside jitted pipelines (returns a keep mask, not indices — static
  shapes for XLA);
* ``greedy_nms_numpy`` is the dependency-free fallback (py_cpu_nms parity).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_LIB_LOCK = threading.Lock()
_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")


def _build_lib() -> Optional[str]:
    src = os.path.join(_NATIVE_DIR, "nms.cpp")
    so = os.path.join(_NATIVE_DIR, "libnms.so")
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", so, src,
             "-lpthread"],
            check=True, capture_output=True)
        return so
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        print(f"[nms] native build failed ({e}); using numpy fallback")
        return None


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB
    with _LIB_LOCK:
        if _LIB is None:
            so = _build_lib()
            if so is None:
                return None
            lib = ctypes.CDLL(so)
            fp = ctypes.POINTER(ctypes.c_float)
            ip = ctypes.POINTER(ctypes.c_int)
            lib.greedy_nms.argtypes = [fp, ctypes.c_int, ctypes.c_float, ip]
            lib.greedy_nms.restype = ctypes.c_int
            lib.soft_nms.argtypes = [fp, ctypes.c_int, ctypes.c_float,
                                     ctypes.c_float, ctypes.c_float,
                                     ctypes.c_int]
            lib.soft_nms.restype = ctypes.c_int
            lib.bitmask_nms.argtypes = [fp, ctypes.c_int, ctypes.c_float, ip]
            lib.bitmask_nms.restype = ctypes.c_int
            _LIB = lib
    return _LIB


def _as_dets(dets: np.ndarray) -> np.ndarray:
    dets = np.ascontiguousarray(dets, np.float32)
    assert dets.ndim == 2 and dets.shape[1] == 5, dets.shape
    return dets


def greedy_nms_numpy(dets: np.ndarray, thresh: float) -> np.ndarray:
    """Pure-numpy greedy NMS (reference py_cpu_nms semantics)."""
    dets = _as_dets(dets)
    x1, y1, x2, y2, scores = dets.T
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(int(i))
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        inter = w * h
        ovr = inter / (areas[i] + areas[order[1:]] - inter)
        order = order[1:][ovr < thresh]
    return np.asarray(keep, np.int64)


def greedy_nms(dets: np.ndarray, thresh: float) -> np.ndarray:
    """Indices (original order) of kept boxes, score-descending."""
    dets = _as_dets(dets)
    lib = _lib()
    if lib is None:
        return greedy_nms_numpy(dets, thresh)
    keep = np.empty(len(dets), np.int32)
    n = lib.greedy_nms(dets.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                       len(dets), thresh,
                       keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return keep[:n].astype(np.int64)


def bitmask_nms(dets: np.ndarray, thresh: float) -> np.ndarray:
    dets = _as_dets(dets)
    lib = _lib()
    if lib is None:
        return greedy_nms_numpy(dets, thresh)
    keep = np.empty(len(dets), np.int32)
    n = lib.bitmask_nms(dets.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                        len(dets), thresh,
                        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return keep[:n].astype(np.int64)


def soft_nms_numpy(dets: np.ndarray, sigma: float = 0.5, nt: float = 0.3,
                   threshold: float = 0.001, method: int = 1) -> np.ndarray:
    """Pure-numpy soft-NMS, mirroring the native kernel (nms.cpp::soft_nms,
    itself the cpu_soft_nms algorithm): in-place score decay with
    swap-to-front max selection and swap-with-last discard."""
    dets = _as_dets(dets).copy()
    count = len(dets)
    i = 0
    while i < count:
        max_pos = i + int(np.argmax(dets[i:count, 4]))
        dets[[i, max_pos]] = dets[[max_pos, i]]
        bx1, by1, bx2, by2 = dets[i, :4]
        area_i = (bx2 - bx1 + 1) * (by2 - by1 + 1)
        j = i + 1
        while j < count:
            x1 = max(bx1, dets[j, 0]); y1 = max(by1, dets[j, 1])
            x2 = min(bx2, dets[j, 2]); y2 = min(by2, dets[j, 3])
            inter = max(0.0, x2 - x1 + 1) * max(0.0, y2 - y1 + 1)
            area_j = ((dets[j, 2] - dets[j, 0] + 1)
                      * (dets[j, 3] - dets[j, 1] + 1))
            ov = inter / (area_i + area_j - inter)
            if method == 1:
                weight = 1.0 - ov if ov > nt else 1.0
            elif method == 2:
                weight = np.exp(-(ov * ov) / sigma)
            else:
                weight = 0.0 if ov > nt else 1.0
            dets[j, 4] *= weight
            if dets[j, 4] < threshold:
                dets[[j, count - 1]] = dets[[count - 1, j]]
                count -= 1
            else:
                j += 1
        i += 1
    return dets[:count]


def soft_nms(dets: np.ndarray, sigma: float = 0.5, nt: float = 0.3,
             threshold: float = 0.001, method: int = 1) -> np.ndarray:
    """Returns the surviving (n', 5) boxes (cpu_soft_nms semantics)."""
    dets = _as_dets(dets).copy()
    lib = _lib()
    if lib is None:
        return soft_nms_numpy(dets, sigma, nt, threshold, method)
    n = lib.soft_nms(dets.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                     len(dets), sigma, nt, threshold, method)
    return dets[:n]


def nms_jax(boxes, scores, iou_threshold: float = 0.3,
            score_threshold: float = -np.inf):
    """On-device greedy NMS: returns a bool keep-mask (static shapes).

    boxes: (N, 4) xyxy; scores: (N,). Suitable for use inside jit — the loop
    is a ``lax.while_loop`` over at most N iterations.
    """
    import jax
    import jax.numpy as jnp

    n = boxes.shape[0]
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)

    def iou_row(i):
        xx1 = jnp.maximum(x1[i], x1)
        yy1 = jnp.maximum(y1[i], y1)
        xx2 = jnp.minimum(x2[i], x2)
        yy2 = jnp.minimum(y2[i], y2)
        inter = jnp.maximum(0.0, xx2 - xx1 + 1) * jnp.maximum(0.0, yy2 - yy1 + 1)
        return inter / (areas[i] + areas - inter)

    def cond(state):
        _, active = state
        return jnp.any(active)

    def body(state):
        keep, active = state
        masked = jnp.where(active, scores, -jnp.inf)
        i = jnp.argmax(masked)
        keep = keep.at[i].set(True)
        suppress = iou_row(i) >= iou_threshold
        active = active & ~suppress & (jnp.arange(n) != i)
        return keep, active

    active0 = scores > score_threshold
    keep0 = jnp.zeros((n,), bool)
    keep, _ = jax.lax.while_loop(cond, body, (keep0, active0))
    return keep

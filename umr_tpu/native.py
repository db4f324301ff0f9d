"""Native (C++) host ops, loaded via ctypes with a lazy g++ build.

The data pipeline's per-sample hot spot is the EDT barrier map (the
reference computes it with two scipy EDT calls per sample per training
step on the main thread, ref: train_s2.py:196-199); here it is a single
fused C++ call (Felzenszwalb–Huttenlocher exact EDT + sigmoid), built once
into native/libumrhost.so and used from loader worker threads (it releases
the GIL for the duration of the call via ctypes).
Falls back to scipy when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_lock = threading.Lock()
_lib = None
_tried = False

_SRC = os.path.join(os.path.dirname(__file__), "..", "native", "edt.cpp")
_SO = os.path.join(os.path.dirname(__file__), "..", "native", "libumrhost.so")


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            src = os.path.abspath(_SRC)
            so = os.path.abspath(_SO)
            if (not os.path.exists(so)
                    or os.path.getmtime(so) < os.path.getmtime(src)):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     src, "-o", so],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(so)
            fp = ctypes.POINTER(ctypes.c_float)
            lib.edt_barrier.argtypes = [fp, fp, ctypes.c_int, ctypes.c_int,
                                        ctypes.c_float]
            lib.edt_barrier_batch.argtypes = [fp, fp, ctypes.c_int,
                                              ctypes.c_int, ctypes.c_int,
                                              ctypes.c_float]
            lib.edt_background.argtypes = [fp, fp, ctypes.c_int, ctypes.c_int]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def has_native():
    return _load() is not None


def edt_barrier(mask, k=50.0):
    """Fused barrier map: sigmoid(k * (EDT_out - EDT_in)/max(H,W)).

    mask: [H, W] float/bool -> [H, W] float32.
    """
    lib = _load()
    mask = np.ascontiguousarray(mask, dtype=np.float32)
    if lib is None:
        from .utils.image import compute_dt_barrier

        return compute_dt_barrier(mask, k).astype(np.float32)
    H, W = mask.shape
    out = np.empty((H, W), np.float32)
    fp = ctypes.POINTER(ctypes.c_float)
    lib.edt_barrier(mask.ctypes.data_as(fp), out.ctypes.data_as(fp),
                    H, W, ctypes.c_float(k))
    return out


def edt_barrier_batch(masks, k=50.0):
    """masks: [B, H, W] -> [B, H, W] float32."""
    lib = _load()
    masks = np.ascontiguousarray(masks, dtype=np.float32)
    if lib is None:
        return np.stack([edt_barrier(m, k) for m in masks])
    B, H, W = masks.shape
    out = np.empty((B, H, W), np.float32)
    fp = ctypes.POINTER(ctypes.c_float)
    lib.edt_barrier_batch(masks.ctypes.data_as(fp), out.ctypes.data_as(fp),
                          B, H, W, ctypes.c_float(k))
    return out

"""ctypes bindings for the native C++ host-preprocessing library.

Builds cpp/preproc.cpp with g++ on first use (cached under build/); every
entry point has a numpy fallback so the package works without a compiler.
This is the host-side counterpart of the lineage's compiled extension tier
(SURVEY.md §2.1 "C++ binding/dispatch layer").
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_ROOT, "cpp", "preproc.cpp")
_SO = os.path.join(_ROOT, "build", "libtpu3dsad_preproc.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
                os.makedirs(os.path.dirname(_SO), exist_ok=True)
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-ffp-contract=off",
                     "-fopenmp", "-shared", "-fPIC", _SRC, "-o", _SO],
                    check=True, capture_output=True, timeout=120,
                )
            lib = ctypes.CDLL(_SO)
            lib.fps.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
            ]
            lib.vote_targets.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
            ]
            lib.range_crop.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int64),
            ]
            lib.range_crop.restype = ctypes.c_int64
            _lib = lib
        except Exception:
            _build_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def fps(points: np.ndarray, m: int, mask: np.ndarray | None = None) -> np.ndarray:
    """Exact-semantics FPS (oracle parity). points [N,3] -> idx [m]."""
    lib = _load()
    pts = np.ascontiguousarray(points[:, :3], np.float32)
    n = pts.shape[0]
    if lib is None:
        from tpu3dsad.ops.oracle import fps_oracle

        return fps_oracle(pts, m, mask)
    out = np.empty(m, np.int64)
    mk = None
    if mask is not None:
        mk = np.ascontiguousarray(mask, np.uint8)
    lib.fps(
        _fptr(pts),
        mk.ctypes.data_as(ctypes.c_void_p) if mk is not None else None,
        n, m, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return out


def vote_targets(points: np.ndarray, boxes: np.ndarray):
    """points [N,3], boxes [G,8] (c,s,heading,cls) -> (votes [N,3], mask [N]).

    Later boxes overwrite earlier ones for points in several boxes, matching
    the python loaders' loop order.
    """
    pts = np.ascontiguousarray(points[:, :3], np.float32)
    bx = np.ascontiguousarray(boxes, np.float32).reshape(-1, 8)
    n, g = pts.shape[0], bx.shape[0]
    lib = _load()
    if lib is None:
        from tpu3dsad.data.sunrgbd import points_in_oriented_box

        votes = np.zeros((n, 3), np.float32)
        vmask = np.zeros(n, bool)
        for i in range(g):
            inside = points_in_oriented_box(pts, bx[i, :3], bx[i, 3:6], bx[i, 6])
            votes[inside] = bx[i, :3] - pts[inside]
            vmask |= inside
        return votes, vmask
    votes = np.zeros((n, 3), np.float32)
    vmask = np.zeros(n, np.uint8)
    lib.vote_targets(
        _fptr(pts), n, _fptr(bx), g, _fptr(votes),
        vmask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return votes, vmask.astype(bool)


def range_crop(points: np.ndarray, lo, hi) -> np.ndarray:
    """points [N,3+] -> indices inside the [lo, hi] box."""
    pts = np.ascontiguousarray(points[:, :3], np.float32)
    n = pts.shape[0]
    lib = _load()
    lo = np.asarray(lo, np.float32)
    hi = np.asarray(hi, np.float32)
    if lib is None:
        keep = np.all((pts >= lo) & (pts <= hi), axis=-1)
        return np.nonzero(keep)[0]
    out = np.empty(n, np.int64)
    cnt = lib.range_crop(
        _fptr(pts), n, _fptr(lo), _fptr(hi),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return out[:cnt]

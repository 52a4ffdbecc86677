"""ctypes bindings for the native host runtime (native/iqtree2_native.cpp).

The .so is built on demand with g++ (cached next to the source); every
entry point has a pure-Python/numpy fallback so the package works without
a toolchain. Covered components (reference analogs in the .cpp):
  - pattern compression (alignment/alignment.cpp:1725)
  - bit-parallel Fitch scoring (tree/phylotreepars.cpp:32)
  - streaming-kernel schedule planning (plan2 phases 1+2)
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_SRC = Path(__file__).parent.parent / "native" / "iqtree2_native.cpp"
_SO = _SRC.with_suffix(".so")
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if os.environ.get("IQTREE2_TPU_DISABLE_NATIVE"):
            return None
        try:
            if not _SO.exists() or \
                    _SO.stat().st_mtime < _SRC.stat().st_mtime:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     "-o", str(_SO), str(_SRC)],
                    check=True, capture_output=True, timeout=120)
            lib = ctypes.CDLL(str(_SO))
            i32p = ctypes.POINTER(ctypes.c_int32)
            u64p = ctypes.POINTER(ctypes.c_uint64)
            f64p = ctypes.POINTER(ctypes.c_double)
            i64 = ctypes.c_int64
            lib.it2_compress_patterns.restype = i64
            lib.it2_compress_patterns.argtypes = [i32p, i64, i64, i32p,
                                                  f64p, i32p]
            lib.it2_fitch_score.restype = ctypes.c_double
            lib.it2_fitch_score.argtypes = [u64p, f64p, i32p, i64, i64,
                                            i64, u64p]
            lib.it2_plan_stream.restype = i64
            lib.it2_plan_stream.argtypes = [i32p, i64, i64, i64, i32p,
                                            i32p, i32p, i64, i32p, i32p]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def available() -> bool:
    return _load() is not None


def compress_patterns(codes: np.ndarray):
    """codes [L, nsites] int32 -> (patterns [nsites_unique, L] int,
    weights, site_to_pattern) or None when native is unavailable."""
    lib = _load()
    if lib is None:
        return None
    codes = np.ascontiguousarray(codes, dtype=np.int32)
    L, nsites = codes.shape
    out_p = np.empty((L, nsites), np.int32)
    out_w = np.empty(nsites, np.float64)
    out_s = np.empty(nsites, np.int32)
    n = lib.it2_compress_patterns(
        _ptr(codes, ctypes.c_int32), L, nsites,
        _ptr(out_p, ctypes.c_int32), _ptr(out_w, ctypes.c_double),
        _ptr(out_s, ctypes.c_int32))
    return out_p[:, :n].T.copy(), out_w[:n].copy(), out_s


def fitch_score(masks: np.ndarray, weights: np.ndarray,
                child_src: np.ndarray) -> float | None:
    """Weighted Fitch cost over a postorder schedule (native)."""
    lib = _load()
    if lib is None:
        return None
    masks = np.ascontiguousarray(masks, dtype=np.uint64)
    w = np.ascontiguousarray(weights, dtype=np.float64)
    cs = np.ascontiguousarray(child_src, dtype=np.int32)
    L, P = masks.shape
    n_int = cs.shape[0]
    scratch = np.empty(((L + n_int), P), np.uint64)
    return float(lib.it2_fitch_score(
        _ptr(masks, ctypes.c_uint64), _ptr(w, ctypes.c_double),
        _ptr(cs, ctypes.c_int32), n_int, L, P,
        _ptr(scratch, ctypes.c_uint64)))


def plan_stream(child_src: np.ndarray, L: int, G: int):
    """Streaming-plan phases 1+2 (native): returns (step_of, slot_of,
    src_blk [n_steps, 2], dst_blk, dst_slot, n_steps, ring_blocks) or
    None."""
    lib = _load()
    if lib is None:
        return None
    cs = np.ascontiguousarray(child_src, dtype=np.int32)
    n_int = cs.shape[0]
    step_of = np.empty(n_int, np.int32)
    slot_of = np.empty(n_int, np.int32)
    cap = 2 * (n_int + 2)
    src_blk = np.zeros(cap, np.int32)
    dst_blk = np.empty(n_int, np.int32)
    dst_slot = np.empty(n_int, np.int32)
    r = lib.it2_plan_stream(
        _ptr(cs, ctypes.c_int32), n_int, L, G,
        _ptr(step_of, ctypes.c_int32), _ptr(slot_of, ctypes.c_int32),
        _ptr(src_blk, ctypes.c_int32), cap,
        _ptr(dst_blk, ctypes.c_int32), _ptr(dst_slot, ctypes.c_int32))
    if r < 0:
        return None
    n_steps = int(r >> 32)
    ring_blocks = int(r & 0xFFFFFFFF)
    return (step_of, slot_of,
            src_blk[: 2 * n_steps].reshape(n_steps, 2).copy(),
            dst_blk, dst_slot, n_steps, ring_blocks)

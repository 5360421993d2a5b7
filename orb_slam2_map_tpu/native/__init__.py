"""ctypes bindings for the native host runtime (native/orbslam_host.cpp).

Every function has a pure-numpy fallback so the engine works without the
compiled library; with it, the list-heavy host stages (2D grid ray
rasterization, distinctive-descriptor selection, observer-list builds)
run at C++ speed — these are the pieces that are C++ in the reference.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB = None
_TRIED = False


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    path = os.path.join(root, "native", "liborbslam_host.so")
    if not os.path.exists(path):
        # try building once if a toolchain is around
        build = os.path.join(root, "native", "build.sh")
        if os.path.exists(build):
            import subprocess

            try:
                subprocess.run(["bash", build], check=True,
                               capture_output=True, timeout=120)
            except Exception:
                return None
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.bresenham_rays.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
    ]
    lib.min_median_hamming_batch.argtypes = [
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.POINTER(ctypes.c_uint32),
    ]
    lib.build_observers.restype = ctypes.c_int64
    lib.build_observers.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
    ]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _lib() is not None


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def bresenham_rays(visited: np.ndarray, occupied: np.ndarray,
                   ox: int, oz: int, px: np.ndarray, pz: np.ndarray
                   ) -> bool:
    """In-place batched ray counting. Returns False if native lib absent
    (caller falls back to Python)."""
    lib = _lib()
    if lib is None:
        return False
    h, w = visited.shape
    assert visited.dtype == np.int32 and occupied.dtype == np.int32
    assert visited.flags.c_contiguous and occupied.flags.c_contiguous
    px = np.ascontiguousarray(px, dtype=np.int64)
    pz = np.ascontiguousarray(pz, dtype=np.int64)
    lib.bresenham_rays(_ptr(visited, ctypes.c_int32),
                       _ptr(occupied, ctypes.c_int32),
                       h, w, int(ox), int(oz),
                       _ptr(px, ctypes.c_int64), _ptr(pz, ctypes.c_int64),
                       len(px))
    return True


def min_median_hamming_batch(descs: np.ndarray, offsets: np.ndarray
                             ) -> Optional[np.ndarray]:
    """CSR-packed descriptors [sum, 8] + offsets [P+1] -> chosen
    descriptor [P, 8]; None if native lib absent."""
    lib = _lib()
    if lib is None:
        return None
    descs = np.ascontiguousarray(descs, dtype=np.uint32)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    P = len(offsets) - 1
    out = np.zeros((P, 8), dtype=np.uint32)
    lib.min_median_hamming_batch(_ptr(descs, ctypes.c_uint32),
                                 _ptr(offsets, ctypes.c_int64),
                                 P, _ptr(out, ctypes.c_uint32))
    return out


def build_observers(kf_obs: np.ndarray, kf_exists: np.ndarray,
                    slot_of_mp: np.ndarray, n_slots: int
                    ) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Returns (counts [P], obs_kf [O], obs_kp [O]) CSR observation lists
    ordered by point slot; None if native lib absent."""
    lib = _lib()
    if lib is None:
        return None
    K, N = kf_obs.shape
    kf_obs = np.ascontiguousarray(kf_obs, dtype=np.int64)
    kf_exists = np.ascontiguousarray(kf_exists, dtype=np.uint8)
    slot_of_mp = np.ascontiguousarray(slot_of_mp, dtype=np.int64)
    counts = np.zeros(n_slots, dtype=np.int32)
    cap = int(kf_exists.sum()) * N
    obs_kf = np.zeros(max(cap, 1), dtype=np.int32)
    obs_kp = np.zeros(max(cap, 1), dtype=np.int32)
    total = lib.build_observers(
        _ptr(kf_obs, ctypes.c_int64), _ptr(kf_exists, ctypes.c_uint8),
        K, N, _ptr(slot_of_mp, ctypes.c_int64), len(slot_of_mp),
        n_slots, _ptr(counts, ctypes.c_int32),
        _ptr(obs_kf, ctypes.c_int32), _ptr(obs_kp, ctypes.c_int32), cap)
    if total < 0:
        return None
    return counts, obs_kf[:total], obs_kp[:total]

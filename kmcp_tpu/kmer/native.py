"""ctypes bridge to the C++ rolling-ntHash scanner (native/nthash.cpp).

Builds the shared library on first use (g++ is part of the environment);
falls back transparently to the NumPy prefix-XOR path when unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "nthash.cpp")
_BUILD_DIR = os.path.join(_REPO, "native", "build")
_SO = os.path.join(_BUILD_DIR, "libkthash.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = [
        "g++", "-O3", "-march=native", "-funroll-loops", "-shared", "-fPIC",
        "-fopenmp", "-o", _SO, _SRC,
    ]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired):
        return False
    if res.returncode != 0:
        # retry without openmp/march
        res = subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
            capture_output=True, text=True, timeout=120,
        )
        if res.returncode != 0:
            print(f"[kmcp-tpu] native hash build failed:\n{res.stderr}",
                  file=sys.stderr)
            return False
    return True


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("KMCP_TPU_NO_NATIVE"):
            return None
        if not os.path.isfile(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.kthash_scan_mt.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
        ]
        lib.kthash_scan_mt.restype = None
        lib.kt_locations.argtypes = [
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_int64, ctypes.c_int,
            ctypes.c_uint64, ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ]
        lib.kt_locations.restype = None
        _lib = lib
        return _lib


def scan(
    buf: bytes | np.ndarray, k: int, canonical: bool = True, threads: int = 0
):
    """All-window ntHash over ``buf``.  Returns (hashes[L-k+1] uint64,
    valid[L-k+1] bool) or None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    if isinstance(buf, np.ndarray):
        buf = buf.tobytes()
    L = len(buf)
    n = L - k + 1
    if n <= 0:
        return np.empty(0, np.uint64), np.empty(0, bool)
    out = np.zeros(n, dtype=np.uint64)
    valid = np.zeros(n, dtype=np.uint8)
    if threads <= 0:
        threads = min(os.cpu_count() or 1, 16)
    lib.kthash_scan_mt(
        buf, L, k, int(canonical),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        threads,
    )
    return out, valid.view(bool)


def locations(
    hashes: np.ndarray, num_hashes: int, num_sigs: int, threads: int = 0
):
    """Bloom-row positions for a hash array (any shape); returns int32 with
    an extra trailing ``num_hashes`` axis, or None if native unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    flat = np.ascontiguousarray(hashes, dtype=np.uint64).ravel()
    out = np.empty(flat.shape[0] * num_hashes, dtype=np.int32)
    if threads <= 0:
        threads = min(os.cpu_count() or 1, 16)
    lib.kt_locations(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        flat.shape[0], num_hashes, num_sigs,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        threads,
    )
    return out.reshape(*hashes.shape, num_hashes)

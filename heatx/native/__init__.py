"""Native (C++) host-runtime components with lazy compilation + ctypes.

The reference's runtime is 100% native Rust; heatx's device compute path is
JAX/XLA, and this package supplies native implementations of the host-side
hot paths: CSV/EPW data loading, the discretization stability search, and
chunk labelling.  The shared library is built from ``csrc/heatx_native.cpp``
with g++ on first use and cached; every caller has a pure-Python fallback, so
the framework works (slower) without a toolchain.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import threading
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "csrc", "heatx_native.cpp")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _cache_dir() -> str:
    d = os.environ.get(
        "HEATX_NATIVE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "heatx"),
    )
    os.makedirs(d, exist_ok=True)
    return d


def _build() -> Optional[str]:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    so_path = os.path.join(_cache_dir(), f"heatx_native_{digest}.so")
    if os.path.exists(so_path):
        return so_path
    # Per-process tmp name: concurrent cold-cache builds (a bench run next
    # to a test run) would otherwise interleave g++ writes into ONE .tmp
    # and os.replace a torn ELF into the cache.
    tmp = f"{so_path}.{os.getpid()}.tmp"
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", tmp, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, so_path)
        return so_path
    except Exception as e:  # g++ missing, sandboxed, etc. -> python fallback
        print(f"heatx.native: build failed ({e}); using python fallbacks", file=sys.stderr)
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    """The native library, building it on first use; None if unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        so = _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            # A corrupt/incompatible cached .so (e.g. -march=native built on
            # a different CPU via a shared home): drop the bad cache entry
            # and rebuild once for THIS machine before giving up.
            try:
                os.unlink(so)
            except OSError:
                pass
            so = _build()
            try:
                lib = ctypes.CDLL(so) if so is not None else None
            except OSError as e:
                print(
                    f"heatx.native: rebuilt library unusable ({e}); using "
                    "python fallbacks", file=sys.stderr,
                )
                return None
            if lib is None:
                return None
        c_double_p = ctypes.POINTER(ctypes.c_double)
        c_int_p = ctypes.POINTER(ctypes.c_int)
        c_long_p = ctypes.POINTER(ctypes.c_long)
        c_u8_p = ctypes.POINTER(ctypes.c_uint8)

        lib.hx_count_rows.restype = ctypes.c_long
        lib.hx_count_rows.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.hx_parse_csv.restype = ctypes.c_long
        lib.hx_parse_csv.argtypes = [
            ctypes.c_char_p, ctypes.c_int, c_int_p, ctypes.c_int,
            c_double_p, ctypes.c_long,
        ]
        lib.hx_discretize_batch.restype = None
        lib.hx_discretize_batch.argtypes = [
            c_double_p, c_double_p, c_double_p, c_double_p, c_u8_p,
            c_long_p, ctypes.c_int, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_double, c_int_p, c_int_p,
        ]
        lib.hx_chunk_ids.restype = ctypes.c_int
        lib.hx_chunk_ids.argtypes = [
            c_u8_p, c_int_p, ctypes.c_long, ctypes.c_int, ctypes.c_int,
            c_int_p, c_double_p,
        ]
        _LIB = lib
        return _LIB


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def parse_csv(path: str, usecols, skip_header: int = 1) -> Optional[np.ndarray]:
    """Native CSV parse of the given columns -> [rows, len(usecols)] float64.
    Returns None if the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    rows = lib.hx_count_rows(path.encode(), skip_header)
    if rows == -2:
        return None  # line exceeds the native buffer: numpy fallback
    if rows < 0:
        raise FileNotFoundError(path)
    cols = np.asarray(usecols, dtype=np.int32)
    out = np.empty((rows, len(cols)), dtype=np.float64)
    got = lib.hx_parse_csv(
        path.encode(), skip_header, _ptr(cols, ctypes.c_int), len(cols),
        _ptr(out, ctypes.c_double), rows,
    )
    if got == -2:
        return None
    if got < 0:
        raise FileNotFoundError(path)
    return out[:got]


def discretize_batch(
    k, rho, cp, thickness, is_gas, offsets, model_dt, max_dx, min_dt, max_rs
):
    """Batched stability search.  Returns (tsubs[int32], n_elements[int32])
    or None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    k = np.ascontiguousarray(k, np.float64)
    rho = np.ascontiguousarray(rho, np.float64)
    cp = np.ascontiguousarray(cp, np.float64)
    thickness = np.ascontiguousarray(thickness, np.float64)
    is_gas = np.ascontiguousarray(is_gas, np.uint8)
    offsets = np.ascontiguousarray(offsets, np.int64)
    n_constructions = len(offsets) - 1
    tsubs = np.empty(n_constructions, np.int32)
    n_elements = np.empty(len(k), np.int32)
    lib.hx_discretize_batch(
        _ptr(k, ctypes.c_double), _ptr(rho, ctypes.c_double),
        _ptr(cp, ctypes.c_double), _ptr(thickness, ctypes.c_double),
        _ptr(is_gas, ctypes.c_uint8), _ptr(offsets, ctypes.c_long),
        n_constructions, model_dt, max_dx, min_dt, max_rs,
        _ptr(tsubs, ctypes.c_int), _ptr(n_elements, ctypes.c_int),
    )
    return tsubs, n_elements


def chunk_ids(nomass: np.ndarray, n_nodes: np.ndarray, c_max: int):
    """Native no-mass run labelling.  Returns (chunk_id[S,N] int32,
    chunk_count[S,C] f64, max_runs) or None when unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    S, N = nomass.shape
    nomass_u8 = np.ascontiguousarray(nomass, np.uint8)
    n_nodes = np.ascontiguousarray(n_nodes, np.int32)
    chunk_id = np.empty((S, N), np.int32)
    chunk_count = np.empty((S, c_max), np.float64)
    max_runs = lib.hx_chunk_ids(
        _ptr(nomass_u8, ctypes.c_uint8), _ptr(n_nodes, ctypes.c_int),
        S, N, c_max, _ptr(chunk_id, ctypes.c_int), _ptr(chunk_count, ctypes.c_double),
    )
    return chunk_id, chunk_count, max_runs

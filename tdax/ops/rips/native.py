"""ctypes bindings for the native C++ Rips engine (cpp/tdax_rips.cc).

Auto-builds the shared library on first use (g++ -O3) and caches it
next to the source.  Falls back gracefully: ``available()`` returns
False when no compiler or build failure, and the python backend takes
over.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_CPP_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))), "cpp")
_SO_PATH = os.path.join(_CPP_DIR, "libtdax_rips.so")
_SRC_PATH = os.path.join(_CPP_DIR, "tdax_rips.cc")

_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-march=native",
        "-pthread",
        "-o", _SO_PATH, _SRC_PATH,
        os.path.join(_CPP_DIR, "tdax_rips_f32.cc"),
        os.path.join(_CPP_DIR, "tdax_rips_sparse.cc"),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError, subprocess.TimeoutExpired) as e:
        err = getattr(e, "stderr", b"")
        print(f"[tdax] native rips build failed: {e} {err[:500] if err else ''}")
        return False


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_SRC_PATH):
            _build_failed = True
            return None
        src_mtime = max(os.path.getmtime(_SRC_PATH),
                        os.path.getmtime(os.path.join(_CPP_DIR, "tdax_rips_f32.cc")),
                        os.path.getmtime(os.path.join(_CPP_DIR, "tdax_rips_sparse.cc")))
        if (not os.path.exists(_SO_PATH)
                or os.path.getmtime(_SO_PATH) < src_mtime):
            if not _build():
                _build_failed = True
                return None
        lib = ctypes.CDLL(_SO_PATH)
        for name, in_t in (("tdax_rips_dense", ctypes.c_double),
                           ("tdax_rips_dense_f32", ctypes.c_float)):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_int
            fn.argtypes = [
                ctypes.POINTER(in_t),             # dist (n*n)
                ctypes.c_int,                     # n
                ctypes.c_int,                     # maxdim
                ctypes.c_double,                  # thresh (inf -> enclosing radius)
                ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),  # out bars
                ctypes.POINTER(ctypes.c_long),    # out record count
            ]
        lib.tdax_free.restype = None
        lib.tdax_free.argtypes = [ctypes.POINTER(ctypes.c_double)]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def rips_native(dist: np.ndarray, maxdim: int = 1,
                thresh: float = np.inf) -> list[np.ndarray]:
    """Dispatches on dtype: float32 inputs use the f32 engine (exactly as
    accurate on f32-derived distances — the engine never rounds — and
    ~bandwidth-halved); anything else goes through the f64 engine."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native rips engine unavailable")
    n = dist.shape[0]
    if dist.dtype == np.float32:
        buf = np.ascontiguousarray(dist, dtype=np.float32)
        fn, ptr_t = lib.tdax_rips_dense_f32, ctypes.c_float
    else:
        buf = np.ascontiguousarray(dist, dtype=np.float64)
        fn, ptr_t = lib.tdax_rips_dense, ctypes.c_double
    out_ptr = ctypes.POINTER(ctypes.c_double)()
    out_len = ctypes.c_long(0)
    rc = fn(
        buf.ctypes.data_as(ctypes.POINTER(ptr_t)),
        n, maxdim, float(thresh),
        ctypes.byref(out_ptr), ctypes.byref(out_len),
    )
    if rc == 3:
        raise ValueError("native rips engine supports maxdim <= 3; "
                         "use backend='python' for higher dimensions")
    if rc == 4:
        raise AssertionError(
            "zero column under enclosing-radius threshold — filtration "
            "should be acyclic above dim 0 (engine invariant violated)")
    if rc == 5:
        raise MemoryError("native rips engine ran out of memory "
                          "(dense engine std::bad_alloc)")
    if rc != 0:
        raise RuntimeError(f"tdax_rips_dense failed with code {rc}")
    try:
        flat = np.ctypeslib.as_array(out_ptr, shape=(out_len.value,)).copy()
    finally:
        lib.tdax_free(out_ptr)
    # layout: repeated records (dim, birth, death); death = -1 encodes inf
    recs = flat.reshape(-1, 3)
    dgms = []
    for p in range(maxdim + 1):
        bars = recs[recs[:, 0] == p][:, 1:3]
        bars = bars.copy()
        bars[bars[:, 1] < 0, 1] = np.inf
        if len(bars):
            idx = np.lexsort((bars[:, 1], bars[:, 0]))
            bars = bars[idx]
        dgms.append(bars)
    return dgms

"""Sparse (CSR) Rips path: device kNN lists -> native sparse engine.

The scale pipeline's transfer-light mode: instead of materializing and
fetching the full n x n distance matrix (400 MB at 10k points), the TPU
computes k-NN neighbor lists (one top-k per row block) and only those
(~n*k entries) cross to the host, where they become the symmetric CSR
the sparse cohomology engine consumes.

Completeness: the thresholded Rips filtration is fully contained in the
k-NN graph iff no vertex has more than k neighbors within the
threshold.  ``csr_from_knn`` verifies this (every truncated row's k-th
distance must exceed the threshold) and raises otherwise — correctness
is never silently traded for sparsity.
"""

from __future__ import annotations

import ctypes

import numpy as np

from tdax.ops.rips import native as _native


def csr_from_knn(knn_idx: np.ndarray, knn_dist: np.ndarray,
                 thresh: float) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(indices [n,k], dists [n,k]) self-first top-k lists -> symmetric CSR
    (indptr int64, indices int32, data float32) of the thresholded graph."""
    n, k = knn_idx.shape
    rows = np.repeat(np.arange(n, dtype=np.int64), k)
    cols = knn_idx.reshape(-1).astype(np.int64)
    vals = knn_dist.reshape(-1).astype(np.float32)

    keep = (vals <= thresh) & (rows != cols)
    rows, cols, vals = rows[keep], cols[keep], vals[keep]

    # completeness: a row that kept all k-1 non-self entries might be
    # truncated — its k-th neighbor distance must exceed the threshold
    kth = knn_dist[:, -1]
    full_rows = np.bincount(rows, minlength=n) >= k - 1
    bad = full_rows & (kth <= thresh)
    if bad.any():
        raise ValueError(
            f"{int(bad.sum())} rows have >= k neighbors within the threshold; "
            f"increase k (got {k}) or lower the threshold for a complete "
            f"sparse filtration")

    # symmetrize + dedup
    a = np.concatenate([rows, cols])
    b = np.concatenate([cols, rows])
    v = np.concatenate([vals, vals])
    key = a * n + b
    order = np.argsort(key, kind="stable")
    key, a, b, v = key[order], a[order], b[order], v[order]
    uniq = np.ones(len(key), dtype=bool)
    uniq[1:] = key[1:] != key[:-1]
    a, b, v = a[uniq], b[uniq], v[uniq]

    indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(indptr, a + 1, 1)
    np.cumsum(indptr, out=indptr)
    return indptr, b.astype(np.int32), v.astype(np.float32)


def rips_sparse(indptr: np.ndarray, indices: np.ndarray, data: np.ndarray,
                maxdim: int = 1) -> list[np.ndarray]:
    """VR diagrams from a symmetric CSR graph via the native sparse engine."""
    lib = _native._load()
    if lib is None:
        raise RuntimeError("native rips engine unavailable")
    fn = lib.tdax_rips_sparse
    fn.restype = ctypes.c_int
    fn.argtypes = [
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
        ctypes.POINTER(ctypes.c_long),
    ]
    n = len(indptr) - 1
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    data = np.ascontiguousarray(data, dtype=np.float32)
    out_ptr = ctypes.POINTER(ctypes.c_double)()
    out_len = ctypes.c_long(0)
    rc = fn(n, indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            maxdim, ctypes.byref(out_ptr), ctypes.byref(out_len))
    if rc == 3:
        raise ValueError("sparse engine supports maxdim <= 3")
    if rc == 4:
        raise MemoryError("sparse engine ran out of memory during reduction")
    if rc != 0:
        raise RuntimeError(f"tdax_rips_sparse failed with code {rc}")
    try:
        flat = np.ctypeslib.as_array(out_ptr, shape=(out_len.value,)).copy()
    finally:
        lib.tdax_free(out_ptr)
    recs = flat.reshape(-1, 3)
    dgms = []
    for p in range(maxdim + 1):
        bars = recs[recs[:, 0] == p][:, 1:3].copy()
        bars[bars[:, 1] < 0, 1] = np.inf
        if len(bars):
            idx = np.lexsort((bars[:, 1], bars[:, 0]))
            bars = bars[idx]
        dgms.append(bars)
    return dgms

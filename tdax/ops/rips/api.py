"""Public Rips API — ripser-compatible call/return shape.

``rips(X, maxdim=1)`` mirrors the reference's as-used ripser contract
(debug_tda_pipeline.py:109-110): Euclidean point cloud in, dict with
``dgms`` (list of (k, 2) float arrays, one per dimension, np.inf
deaths for essential classes) out.
"""

from __future__ import annotations

import numpy as np

from tdax.ops.distances import pairwise_cosine_np, pairwise_euclidean_np
from tdax.ops.rips.reference import rips_reference


def _native_available() -> bool:
    from tdax.ops.rips import native
    return native.available()


def rips_from_distances(dist: np.ndarray, maxdim: int = 1,
                        thresh: float = np.inf, coeff: int = 2,
                        backend: str = "auto") -> dict:
    if coeff != 2:
        raise NotImplementedError("only Z/2 coefficients are supported (ripser default)")
    # float32 inputs stay float32 (the native engine has an exact f32 path);
    # everything else runs in float64
    keep = np.float32 if np.asarray(dist).dtype == np.float32 else np.float64
    dist = np.ascontiguousarray(dist, dtype=keep)
    if backend == "auto":
        # native engine's fixed vertex buffers cap it at maxdim 3
        backend = "native" if (maxdim <= 3 and _native_available()) else "python"
    if backend == "native":
        from tdax.ops.rips import native
        dgms = native.rips_native(dist, maxdim=maxdim, thresh=thresh)
    elif backend == "python":
        dgms = rips_reference(dist, maxdim=maxdim, thresh=thresh)
    else:
        raise ValueError(f"unknown backend {backend!r}")
    return {"dgms": [np.asarray(d, dtype=np.float64).reshape(-1, 2) for d in dgms]}


def rips(x: np.ndarray, maxdim: int = 1, thresh: float = np.inf,
         coeff: int = 2, metric: str = "euclidean",
         backend: str = "auto") -> dict:
    """Vietoris-Rips persistence of a point cloud.

    Distances are computed in float64 difference form then rounded to
    float32 — matching ripser.py, which casts inputs to float32 before
    its C++ core, so diagram values agree to float32 round-off
    (well inside the 1e-5 bottleneck parity bar).
    """
    x = np.asarray(x)
    if metric == "euclidean":
        dist = pairwise_euclidean_np(x)
    elif metric == "cosine":
        dist = pairwise_cosine_np(x)
    else:
        raise ValueError(f"unknown metric {metric!r}")
    dist = dist.astype(np.float32).astype(np.float64)
    return rips_from_distances(dist, maxdim=maxdim, thresh=thresh,
                               coeff=coeff, backend=backend)

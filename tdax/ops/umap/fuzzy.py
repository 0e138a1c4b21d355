"""kNN graph + fuzzy simplicial set construction.

Behavioral contract follows umap-learn's ``nearest_neighbors`` /
``smooth_knn_dist`` / ``compute_membership_strengths`` /
``fuzzy_simplicial_set`` as used by the reference
(debug_tda_pipeline.py:96-104): k includes the point itself as its
first neighbor (distance 0), target entropy log2(k), 64-step binary
search for sigma, rho from ``local_connectivity``, symmetrization
W = A + A^T - A o A^T (set_op_mix_ratio = 1).

Everything is fixed-shape jnp — kNN is an exact all-pairs top-k (the
right call on TPU for n up to tens of thousands: one MXU matmul plus a
top-k, no approximate NN-descent needed), and the fuzzy graph is kept
dense [n, n], which vmaps cleanly over a leading clouds axis.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

SMOOTH_K_TOLERANCE = 1e-5
MIN_K_DIST_SCALE = 1e-3


def pairwise(x: jnp.ndarray, metric: str) -> jnp.ndarray:
    """Distance matrix via the shared kernels in tdax.ops.distances
    (single source of truth for the MXU expansion form + clipping)."""
    from tdax.ops.distances import pairwise_cosine, pairwise_euclidean

    if metric == "cosine":
        return pairwise_cosine(x)
    if metric == "euclidean":
        return pairwise_euclidean(x)
    raise ValueError(f"unsupported metric {metric!r}")


def knn(dist: jnp.ndarray, k: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(indices [n,k], distances [n,k]) ascending; self is first (d=0)."""
    neg, idx = jax.lax.top_k(-dist, k)
    return idx, -neg


def smooth_knn_dist(knn_dists: jnp.ndarray, k: float,
                    local_connectivity: float = 1.0,
                    bandwidth: float = 1.0,
                    n_iter: int = 64) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-point (sigma, rho) via binary search to hit log2(k) entropy."""
    target = jnp.log2(k) * bandwidth
    n = knn_dists.shape[0]

    # rho: interpolated local_connectivity-th smallest NONZERO distance.
    nonzero = jnp.where(knn_dists > 0.0, knn_dists, jnp.inf)
    nonzero_sorted = jnp.sort(nonzero, axis=1)
    n_nonzero = jnp.sum(knn_dists > 0.0, axis=1)
    index = int(math.floor(local_connectivity))  # static hyperparameter math
    interpolation = local_connectivity - index

    if index > 0:
        lo = nonzero_sorted[:, index - 1]
        if interpolation > SMOOTH_K_TOLERANCE:
            # umap only interpolates when the fraction is non-negligible;
            # guard the upper neighbor (inf when fewer nonzero distances
            # exist) so 0*inf never produces NaN
            hi = nonzero_sorted[:, min(index, knn_dists.shape[1] - 1)]
            hi = jnp.where(jnp.isfinite(hi), hi, lo)
            rho_interp = lo + interpolation * (hi - lo)
        else:
            rho_interp = lo
    else:
        rho_interp = interpolation * nonzero_sorted[:, 0]
    rho_max = jnp.where(n_nonzero > 0, jnp.max(jnp.where(jnp.isfinite(nonzero), nonzero, 0.0), axis=1), 0.0)
    rho = jnp.where(n_nonzero >= local_connectivity, rho_interp, rho_max)
    rho = jnp.where(n_nonzero > 0, rho, 0.0)
    rho = jnp.where(jnp.isfinite(rho), rho, 0.0)

    # binary search for sigma (umap: lo=0, hi=inf, mid=1, 64 iters)
    d_adj = knn_dists[:, 1:] - rho[:, None]  # skip self at column 0

    def psum(mid):
        return jnp.sum(jnp.where(d_adj > 0, jnp.exp(-d_adj / mid[:, None]), 1.0), axis=1)

    def body(_, state):
        lo, hi, mid = state
        p = psum(mid)
        hi_new = jnp.where(p > target, mid, hi)
        lo_new = jnp.where(p > target, lo, mid)
        mid_new = jnp.where(p > target,
                            (lo_new + hi_new) / 2.0,
                            jnp.where(jnp.isinf(hi_new), mid * 2.0, (lo_new + hi_new) / 2.0))
        return lo_new, hi_new, mid_new

    lo0 = jnp.zeros(n, dtype=knn_dists.dtype)
    hi0 = jnp.full(n, jnp.inf, dtype=knn_dists.dtype)
    mid0 = jnp.ones(n, dtype=knn_dists.dtype)
    _, _, sigma = jax.lax.fori_loop(0, n_iter, body, (lo0, hi0, mid0))

    # lower bounds (umap MIN_K_DIST_SCALE clamps)
    mean_i = jnp.mean(knn_dists, axis=1)
    mean_all = jnp.mean(knn_dists)
    sigma = jnp.where(rho > 0.0,
                      jnp.maximum(sigma, MIN_K_DIST_SCALE * mean_i),
                      jnp.maximum(sigma, MIN_K_DIST_SCALE * mean_all))
    return sigma, rho


def membership_strengths_knn(knn_idx: jnp.ndarray, knn_dists: jnp.ndarray,
                             sigma: jnp.ndarray, rho: jnp.ndarray) -> jnp.ndarray:
    """Directed membership weights on the kNN lists themselves [n, k]
    (self entries zero) — the sparse-path counterpart of
    ``membership_strengths``, which scatters into a dense [n, n]."""
    n, k = knn_idx.shape
    d_adj = knn_dists - rho[:, None]
    w = jnp.where(d_adj <= 0.0, 1.0, jnp.exp(-d_adj / sigma[:, None]))
    rows = jnp.broadcast_to(jnp.arange(n)[:, None], (n, k))
    return jnp.where(knn_idx == rows, 0.0, w)


def membership_strengths(knn_idx: jnp.ndarray, knn_dists: jnp.ndarray,
                         sigma: jnp.ndarray, rho: jnp.ndarray) -> jnp.ndarray:
    """Dense directed membership matrix A[i, j] (self edges zero)."""
    n, k = knn_idx.shape
    d_adj = knn_dists - rho[:, None]
    w = jnp.where(d_adj <= 0.0, 1.0, jnp.exp(-d_adj / sigma[:, None]))
    rows = jnp.broadcast_to(jnp.arange(n)[:, None], (n, k))
    is_self = knn_idx == rows
    w = jnp.where(is_self, 0.0, w)
    a = jnp.zeros((n, n), dtype=w.dtype)
    return a.at[rows.reshape(-1), knn_idx.reshape(-1)].add(w.reshape(-1))


@functools.partial(jax.jit, static_argnames=("n_neighbors", "metric", "local_connectivity",
                                             "set_op_mix_ratio"))
def fuzzy_simplicial_set(x: jnp.ndarray, n_neighbors: int, metric: str = "cosine",
                         local_connectivity: float = 1.0,
                         set_op_mix_ratio: float = 1.0) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (W [n,n] symmetric fuzzy graph, sigma [n], rho [n])."""
    dist = pairwise(x, metric)
    idx, dists = knn(dist, n_neighbors)
    sigma, rho = smooth_knn_dist(dists, float(n_neighbors),
                                 local_connectivity=local_connectivity)
    a = membership_strengths(idx, dists, sigma, rho)
    t = a.T
    prod = a * t
    w = set_op_mix_ratio * (a + t - prod) + (1.0 - set_op_mix_ratio) * prod
    return w, sigma, rho

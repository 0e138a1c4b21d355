"""Sharded large-scale kernels over the device mesh.

The reference's scale axis is point-cloud size (SURVEY §5): a 10k x 10k
distance matrix from 4096-d embeddings is ~400 MB plus 4e11 FLOPs —
here it is computed as row-blocks over the mesh with shard_map: each
device holds its block of rows, all_gathers the (much smaller) operand
once, and emits its block of the output; the result stays sharded for
downstream on-device consumers (Boruvka H0, kNN top-k) and is only
gathered to host for the native H1/H2 engine.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def sharded_pairwise_sq_euclidean(x: jnp.ndarray, mesh: Mesh,
                                  axis: str = "dp") -> jnp.ndarray:
    """x [n, d] replicated-or-sharded -> [n, n] sharded over rows on
    ``axis``.  n must be divisible by the axis size."""

    def block(x_rows, x_full):
        # x_rows: [n/p, d] local rows; x_full: [n, d] replicated
        sq_r = jnp.sum(x_rows * x_rows, axis=1, keepdims=True)
        sq_f = jnp.sum(x_full * x_full, axis=1, keepdims=True)
        g = jnp.dot(x_rows, x_full.T, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
        return jnp.maximum(sq_r + sq_f.T - 2.0 * g, 0.0)

    fn = shard_map(block, mesh=mesh,
                   in_specs=(P(axis, None), P(None, None)),
                   out_specs=P(axis, None))
    xs = jax.device_put(x, NamedSharding(mesh, P(axis, None)))
    xf = jax.device_put(x, NamedSharding(mesh, P()))
    return jax.jit(fn)(xs, xf)


def sharded_knn(x: jnp.ndarray, k: int, mesh: Mesh, axis: str = "dp",
                metric: str = "euclidean") -> tuple[np.ndarray, np.ndarray]:
    """Exact kNN of all points, row-sharded: each device top-k's its own
    row block; returns host (indices [n,k], distances [n,k])."""

    def block(x_rows, x_full):
        if metric == "cosine":
            xr = x_rows / jnp.maximum(jnp.linalg.norm(x_rows, axis=1, keepdims=True), 1e-30)
            xf = x_full / jnp.maximum(jnp.linalg.norm(x_full, axis=1, keepdims=True), 1e-30)
            d = jnp.clip(1.0 - jnp.dot(xr, xf.T, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST), 0.0, 2.0)
        else:
            sq_r = jnp.sum(x_rows * x_rows, axis=1, keepdims=True)
            sq_f = jnp.sum(x_full * x_full, axis=1, keepdims=True)
            d = jnp.maximum(sq_r + sq_f.T - 2.0 * jnp.dot(
                x_rows, x_full.T, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST), 0.0)
            d = jnp.sqrt(d)
        neg, idx = jax.lax.top_k(-d, k)
        return idx, -neg

    fn = shard_map(block, mesh=mesh,
                   in_specs=(P(axis, None), P(None, None)),
                   out_specs=(P(axis, None), P(axis, None)))
    xs = jax.device_put(x, NamedSharding(mesh, P(axis, None)))
    xf = jax.device_put(x, NamedSharding(mesh, P()))
    idx, dists = jax.jit(fn, static_argnames=())(xs, xf)
    return np.asarray(idx), np.asarray(dists)

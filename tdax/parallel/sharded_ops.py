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


def sharded_edge_extract(x: jnp.ndarray, thresh: float, row_budget: int,
                         mesh: Mesh, axis: str = "dp",
                         chunk: int = 2048):
    """Thresholded-edge extraction for the sparse scale path, row-sharded
    over the mesh: each device computes expansion-form distances for its
    row shard against the replicated cloud (inner-chunked to bound the
    live [chunk, n] block), keeps the per-row k smallest within the
    threshold, and emits the kept columns SORTED by column id plus the
    per-row counts — the same contract as the single-device blocked
    extraction in tdax.pipeline.scale, so the host CSR assembly is a
    pure concatenation either way.

    Rows are padded (with copies of row 0) to a multiple of
    axis_size * chunk; padded rows are sliced off host-side and excluded
    from the truncation check.  Returns host-side
    (cols [n, row_budget] int32, counts [n] int32, n_truncated int).
    """
    import math

    n, _ = x.shape
    p = mesh.shape[axis]
    c = min(chunk, max(1, n // p) or 1)
    n_pad = math.ceil(n / (p * c)) * (p * c)
    xs = jnp.concatenate([x, jnp.broadcast_to(x[0], (n_pad - n,) + x.shape[1:])]) \
        if n_pad > n else x
    k = row_budget

    def block(x_rows, x_full):
        m = x_rows.shape[0]
        row0 = jax.lax.axis_index(axis) * m
        sq_f = jnp.sum(x_full * x_full, axis=1)

        def one(chunk_rows_and_idx):
            xr, c0 = chunk_rows_and_idx
            sq_r = jnp.sum(xr * xr, axis=1, keepdims=True)
            d2 = sq_r + sq_f[None, :] - 2.0 * jnp.dot(
                xr, x_full.T, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            d = jnp.sqrt(jnp.maximum(d2, 0.0))
            rows_abs = row0 + c0 * c + jnp.arange(c)[:, None]
            cols_iota = jnp.arange(x_full.shape[0])[None, :]
            d = jnp.where(rows_abs == cols_iota, jnp.inf, d)
            neg_vals, idx = jax.lax.approx_max_k(-d, k, recall_target=1.0)
            vals = -neg_vals
            keep = vals <= jnp.float32(thresh)
            counts = jnp.sum(keep, axis=1, dtype=jnp.int32)
            cols = jnp.sort(jnp.where(keep, idx, x_full.shape[0]), axis=1)
            valid = rows_abs[:, 0] < n  # padded rows don't count
            trunc = (vals[:, -1] <= jnp.float32(thresh)) & valid
            return cols, counts, trunc

        xc = x_rows.reshape(m // c, c, x_rows.shape[1])
        cols, counts, trunc = jax.lax.map(
            one, (xc, jnp.arange(m // c, dtype=jnp.int32)))
        return (cols.reshape(m, k), counts.reshape(m),
                trunc.reshape(m))

    fn = shard_map(block, mesh=mesh,
                   in_specs=(P(axis, None), P(None, None)),
                   out_specs=(P(axis, None), P(axis), P(axis)))
    xsh = jax.device_put(xs, NamedSharding(mesh, P(axis, None)))
    xf = jax.device_put(xs[:n] if n_pad > n else xs,
                        NamedSharding(mesh, P()))
    cols, counts, trunc = jax.jit(fn)(xsh, xf)
    return (np.asarray(cols)[:n], np.asarray(counts)[:n],
            int(np.asarray(trunc).sum()))

"""Large-n UMAP: fixed-size edge lists instead of dense [n, n] tensors.

The dense path (fuzzy.py / layout.py) materializes an [n, n] fuzzy graph
and an [n_head, n_tail, neg, d] repulsion tensor — exact and fast for
the reference's 36–720-point clouds, hopeless at the 10k–100k points
umap-learn handles routinely.  This module is the same algorithm on the
kNN graph's edge list:

  * kNN: exact blocked all-pairs top-k on the MXU (one program for
    n <= 16384, row blocks above);
  * sigma/rho calibration and membership strengths on the [n, k] lists
    (identical math to fuzzy.py — shared functions);
  * fuzzy symmetrization W = A + A^T - A o A^T on the host as a sparse
    COO merge (n*k entries; numpy, deterministic);
  * spectral init by block LOBPCG on the deflated normalized adjacency
    with segment-sum matvecs (no [n, n] Laplacian, no eigh) — umap's
    default ``init='spectral'`` semantics at any n;
  * the SGD layout as a lax.scan over epochs with per-edge sampling
    schedules and per-epoch negative draws — O(E * neg * d) per epoch,
    deterministic under the key, same gradient/clip/schedule semantics
    as layout.py.

Small-n behavior is unchanged: UMAP dispatches to the dense path below
``sparse_threshold`` (bit-identical to before).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from tdax.ops.umap.fuzzy import membership_strengths_knn, smooth_knn_dist


def knn_blocked(x: jnp.ndarray, k: int, metric: str,
                block_rows: int = 8192, mesh=None,
                axis: str = "dp") -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact kNN lists (idx [n,k], dist [n,k]; self first) via blocked
    all-pairs distances on device; with ``mesh`` the row blocks shard
    over the mesh axis instead of looping on one chip (each output
    element's arithmetic is identical under row blocking, so the mesh
    result is bit-equal to the single-device one)."""
    n = x.shape[0]

    if metric == "cosine":
        xn = x / jnp.maximum(jnp.linalg.norm(x, axis=1, keepdims=True), 1e-30)
    else:
        xn = x

    if mesh is not None:
        return _knn_sharded(xn, n, k, metric, mesh, axis,
                            chunk=min(block_rows, 2048))

    @functools.partial(jax.jit, static_argnames=())
    def block(rows, full, row0):
        if metric == "cosine":
            d = jnp.clip(1.0 - jnp.dot(
                rows, full.T, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST), 0.0, 2.0)
        else:
            sq_r = jnp.sum(rows * rows, axis=1, keepdims=True)
            sq_f = jnp.sum(full * full, axis=1, keepdims=True)
            d = jnp.sqrt(jnp.maximum(
                sq_r + sq_f.T - 2.0 * jnp.dot(
                    rows, full.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST), 0.0))
        # the expansion form leaves O(1e-3) cancellation residue on the
        # diagonal; pin self-distance to exactly 0 so self ranks first
        # (the sigma/rho calibration skips column 0 as the self entry)
        rows_abs = row0 + jnp.arange(rows.shape[0])[:, None]
        d = jnp.where(rows_abs == jnp.arange(full.shape[0])[None, :], 0.0, d)
        neg, idx = jax.lax.top_k(-d, k)
        return idx, -neg

    if n <= block_rows:
        return block(xn, xn, jnp.int32(0))
    idxs, dists = [], []
    br = block_rows
    for r0 in range(0, n, br):
        hi = min(r0 + br, n)
        pad = br - (hi - r0)
        rows = jnp.concatenate([xn[r0:hi], xn[:pad]]) if pad else xn[r0:hi]
        i, d = block(rows, xn, jnp.int32(r0))
        idxs.append(i[:hi - r0])
        dists.append(d[:hi - r0])
    return jnp.concatenate(idxs), jnp.concatenate(dists)


def _knn_sharded(xn: jnp.ndarray, n: int, k: int, metric: str, mesh,
                 axis: str, chunk: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Row-sharded exact kNN over the mesh (normalized input for cosine;
    rows padded with copies of row 0 and sliced off host-side)."""
    import math as _math

    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax import shard_map

    p = mesh.shape[axis]
    c = min(chunk, max(1, n // p) or 1)
    n_pad = _math.ceil(n / (p * c)) * (p * c)
    xs = jnp.concatenate([xn, jnp.broadcast_to(xn[0], (n_pad - n,) + xn.shape[1:])]) \
        if n_pad > n else xn

    def worker(x_rows, x_full):
        m = x_rows.shape[0]
        row0 = jax.lax.axis_index(axis) * m

        def one(args):
            xr, c0 = args
            if metric == "cosine":
                d = jnp.clip(1.0 - jnp.dot(
                    xr, x_full.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST), 0.0, 2.0)
            else:
                sq_r = jnp.sum(xr * xr, axis=1, keepdims=True)
                sq_f = jnp.sum(x_full * x_full, axis=1, keepdims=True)
                d = jnp.sqrt(jnp.maximum(
                    sq_r + sq_f.T - 2.0 * jnp.dot(
                        xr, x_full.T, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST), 0.0))
            rows_abs = row0 + c0 * c + jnp.arange(c)[:, None]
            d = jnp.where(rows_abs == jnp.arange(x_full.shape[0])[None, :],
                          0.0, d)  # pin self to exact 0 (ranks first)
            neg, idx = jax.lax.top_k(-d, k)
            return idx, -neg

        xc = x_rows.reshape(m // c, c, x_rows.shape[1])
        i, d = jax.lax.map(one, (xc, jnp.arange(m // c, dtype=jnp.int32)))
        return i.reshape(m, k), d.reshape(m, k)

    fn = shard_map(worker, mesh=mesh,
                   in_specs=(P(axis, None), P(None, None)),
                   out_specs=(P(axis, None), P(axis, None)))
    xsh = jax.device_put(xs, NamedSharding(mesh, P(axis, None)))
    xf = jax.device_put(xn, NamedSharding(mesh, P()))
    i, d = jax.jit(fn)(xsh, xf)
    return i[:n], d[:n]


def knn_blocked_cross(x_new: jnp.ndarray, x_train: jnp.ndarray, k: int,
                      metric: str, block_rows: int = 8192, mesh=None,
                      axis: str = "dp"
                      ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """kNN lists of x_new against x_train (idx [n_new,k], dist [n_new,k];
    no self-distance semantics — the two clouds are distinct).  With
    ``mesh`` the new points' row blocks shard over the mesh axis
    (bit-equal: row blocking leaves each output element's arithmetic
    unchanged)."""
    n_new = x_new.shape[0]

    if metric == "cosine":
        xn = x_new / jnp.maximum(jnp.linalg.norm(x_new, axis=1, keepdims=True),
                                 1e-30)
        tn = x_train / jnp.maximum(jnp.linalg.norm(x_train, axis=1,
                                                   keepdims=True), 1e-30)
    else:
        xn, tn = x_new, x_train

    if mesh is not None:
        return _knn_cross_sharded(xn, tn, n_new, k, metric, mesh, axis,
                                  chunk=min(block_rows, 2048))

    @jax.jit
    def block(rows, full):
        if metric == "cosine":
            d = jnp.clip(1.0 - jnp.dot(
                rows, full.T, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST), 0.0, 2.0)
        else:
            sq_r = jnp.sum(rows * rows, axis=1, keepdims=True)
            sq_f = jnp.sum(full * full, axis=1, keepdims=True)
            d = jnp.sqrt(jnp.maximum(
                sq_r + sq_f.T - 2.0 * jnp.dot(
                    rows, full.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST), 0.0))
        neg, idx = jax.lax.top_k(-d, k)
        return idx, -neg

    if n_new <= block_rows:
        return block(xn, tn)
    idxs, dists = [], []
    for r0 in range(0, n_new, block_rows):
        hi = min(r0 + block_rows, n_new)
        pad = block_rows - (hi - r0)
        rows = jnp.concatenate([xn[r0:hi], xn[:pad]]) if pad else xn[r0:hi]
        i, d = block(rows, tn)
        idxs.append(i[:hi - r0])
        dists.append(d[:hi - r0])
    return jnp.concatenate(idxs), jnp.concatenate(dists)


def _knn_cross_sharded(xn: jnp.ndarray, tn: jnp.ndarray, n_new: int,
                       k: int, metric: str, mesh, axis: str,
                       chunk: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Row-sharded cross-kNN (normalized inputs; new-point rows padded
    with copies of row 0 and sliced off host-side)."""
    import math as _math

    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax import shard_map

    p = mesh.shape[axis]
    c = min(chunk, max(1, n_new // p) or 1)
    n_pad = _math.ceil(n_new / (p * c)) * (p * c)
    xs = jnp.concatenate(
        [xn, jnp.broadcast_to(xn[0], (n_pad - n_new,) + xn.shape[1:])]) \
        if n_pad > n_new else xn

    def worker(x_rows, x_full):
        m = x_rows.shape[0]

        def one(xr):
            if metric == "cosine":
                d = jnp.clip(1.0 - jnp.dot(
                    xr, x_full.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST), 0.0, 2.0)
            else:
                sq_r = jnp.sum(xr * xr, axis=1, keepdims=True)
                sq_f = jnp.sum(x_full * x_full, axis=1, keepdims=True)
                d = jnp.sqrt(jnp.maximum(
                    sq_r + sq_f.T - 2.0 * jnp.dot(
                        xr, x_full.T, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST), 0.0))
            neg, idx = jax.lax.top_k(-d, k)
            return idx, -neg

        xc = x_rows.reshape(m // c, c, x_rows.shape[1])
        i, d = jax.lax.map(one, xc)
        return i.reshape(m, k), d.reshape(m, k)

    fn = shard_map(worker, mesh=mesh,
                   in_specs=(P(axis, None), P(None, None)),
                   out_specs=(P(axis, None), P(axis, None)))
    xsh = jax.device_put(xs, NamedSharding(mesh, P(axis, None)))
    tf = jax.device_put(tn, NamedSharding(mesh, P()))
    i, d = jax.jit(fn)(xsh, tf)
    return i[:n_new], d[:n_new]


def build_sym_edges(knn_idx: np.ndarray, w: np.ndarray,
                    set_op_mix_ratio: float = 1.0
                    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Directed membership lists -> symmetric COO edge list (host).

    Returns (head [E], tail [E], weight [E]) containing BOTH directions
    of every undirected edge (umap's layout iterates all nonzeros of the
    symmetric matrix), weights W = mix*(A + A^T - A o A^T) + (1-mix)*A o A^T,
    self-loops and zero weights dropped, deterministic order.
    """
    n, k = knn_idx.shape
    rows = np.repeat(np.arange(n, dtype=np.int64), k)
    cols = knn_idx.reshape(-1).astype(np.int64)
    vals = np.asarray(w, dtype=np.float64).reshape(-1)
    keep = (rows != cols) & (vals > 0)
    rows, cols, vals = rows[keep], cols[keep], vals[keep]

    # dedup duplicate directed entries (can happen with distance ties)
    key = rows * n + cols
    order = np.argsort(key, kind="stable")
    key, rows, cols, vals = key[order], rows[order], cols[order], vals[order]
    uniq = np.ones(len(key), dtype=bool)
    uniq[1:] = key[1:] != key[:-1]
    grp = np.cumsum(uniq) - 1
    a_val = np.zeros(int(grp[-1]) + 1 if len(grp) else 0)
    np.maximum.at(a_val, grp, vals)  # umap dedups by max on ties
    rows, cols = rows[uniq], cols[uniq]

    # A o A^T and A + A^T via key merge: transpose key = cols * n + rows
    key = rows * n + cols
    tkey = cols * n + rows
    pos = np.searchsorted(key, tkey)
    pos_clip = np.minimum(pos, len(key) - 1)
    has_t = key[pos_clip] == tkey
    at_val = np.where(has_t, a_val[pos_clip], 0.0)

    sym = set_op_mix_ratio * (a_val + at_val - a_val * at_val) \
        + (1.0 - set_op_mix_ratio) * (a_val * at_val)

    # union of both directions: entries where only (j,i) exists appear
    # when scanning (j, i)'s own row, so emitting (rows, cols, sym) for
    # every directed entry ALREADY covers both directions of every edge
    # present in either list — except (i, j) pairs where i never listed
    # j.  Emit the reverse of one-sided edges explicitly.
    one_sided = ~has_t
    head = np.concatenate([rows, cols[one_sided]])
    tail = np.concatenate([cols, rows[one_sided]])
    wgt = np.concatenate([sym, sym[one_sided]])
    keep = wgt > 0
    head, tail, wgt = head[keep], tail[keep], wgt[keep]
    order = np.lexsort((tail, head))
    return (head[order].astype(np.int32), tail[order].astype(np.int32),
            wgt[order].astype(np.float32))


@functools.partial(jax.jit, static_argnames=("n", "n_components", "n_iter"))
def spectral_init_edges(head: jnp.ndarray, tail: jnp.ndarray, w: jnp.ndarray,
                        n: int, n_components: int, key: jax.Array,
                        n_iter: int = 200) -> jnp.ndarray:
    """Bottom non-trivial eigenvectors of the normalized Laplacian by
    orthogonal iteration on M = D^-1/2 W D^-1/2 (segment-sum matvecs,
    trivial eigenvector deflated analytically), scaled to max-abs 10
    with the same 1e-4 jitter as the dense spectral_init."""
    deg = jax.ops.segment_sum(w, head, num_segments=n)
    inv_sqrt = jnp.where(deg > 0, 1.0 / jnp.sqrt(jnp.maximum(deg, 1e-12)), 0.0)
    v0 = jnp.sqrt(jnp.maximum(deg, 0.0))
    v0 = v0 / jnp.maximum(jnp.linalg.norm(v0), 1e-12)
    coef = w * inv_sqrt[head] * inv_sqrt[tail]

    def matvec(v):  # [n, c]
        return jax.ops.segment_sum(coef[:, None] * v[tail], head,
                                   num_segments=n)

    def ortho(v):
        v = v - v0[:, None] * (v0 @ v)[None, :]
        q, _ = jnp.linalg.qr(v)
        return q

    v = jax.random.normal(key, (n, n_components), jnp.float32)
    v = ortho(v)

    def body(_, v):
        # shift by +1 so eigenvalues of M+I are positive and the largest
        # of M dominate the iteration
        return ortho(matvec(v) + v)

    v = jax.lax.fori_loop(0, n_iter, body, v)
    # order columns by Rayleigh quotient of M descending == Laplacian
    # eigenvalue ascending (the bottom non-trivial eigenvectors)
    rq = jnp.sum(v * matvec(v), axis=0)
    v = v[:, jnp.argsort(-rq)]
    emb = v * (10.0 / jnp.maximum(jnp.max(jnp.abs(v)), 1e-12))
    noise = jax.random.normal(jax.random.fold_in(key, 1), emb.shape,
                              emb.dtype) * 1e-4
    return (emb + noise).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("n", "n_components", "m"))
def spectral_init_lobpcg(head: jnp.ndarray, tail: jnp.ndarray,
                         w: jnp.ndarray, n: int, n_components: int,
                         key: jax.Array, m: int = 400) -> jnp.ndarray:
    """umap-learn's ``init='spectral'`` semantics at scale: the bottom
    non-trivial eigenvectors of the normalized Laplacian
    L = I - D^-1/2 W D^-1/2 of the symmetrized fuzzy graph
    (debug_tda_pipeline.py:96-102 uses umap defaults), scaled to
    max-abs 10 with the 1e-4 jitter — the contract the dense path's
    ``spectral_init`` (eigh) fulfils below the threshold.

    Computed by block LOBPCG (jax.experimental.sparse.linalg) on the
    spectral complement B = I + M - 2 v0 v0^T, where M = D^-1/2 W D^-1/2
    and v0 = sqrt(deg)/||sqrt(deg)|| is L's trivial null vector:
    eig(B) = 2 - eig(L) on v0's orthogonal complement and the deflation
    maps the trivial pair to 0, so LOBPCG's TOP n_components of B are
    exactly the bottom non-trivial of L in ascending Laplacian order.
    The matvec is the edge-list segment sum — no [n, n] materialization.
    Disconnected graphs work unchanged: the remaining eigenvalue-2
    eigenvectors of B are per-component indicators, so components
    separate in the init (same property as the dense path).  Plain
    (unblocked, unshifted) orthogonal iteration failed here — manifold
    kNN graphs have near-degenerate bottom spectra — which is why the
    earlier revision substituted PCA; LOBPCG's Rayleigh–Ritz over the
    [X, R, P] block handles exactly that regime."""
    from jax.experimental.sparse.linalg import lobpcg_standard

    deg = jax.ops.segment_sum(w, head, num_segments=n,
                              indices_are_sorted=True)
    inv_sqrt = jnp.where(deg > 0, 1.0 / jnp.sqrt(jnp.maximum(deg, 1e-12)), 0.0)
    v0 = jnp.sqrt(jnp.maximum(deg, 0.0))
    v0 = v0 / jnp.maximum(jnp.linalg.norm(v0), 1e-12)
    coef = (w * inv_sqrt[head] * inv_sqrt[tail]).astype(jnp.float32)

    def bmat(vblock):  # [n, k] -> [n, k]
        mv = jax.ops.segment_sum(coef[:, None] * vblock[tail], head,
                                 num_segments=n, indices_are_sorted=True)
        return vblock + mv - 2.0 * v0[:, None] * (v0 @ vblock)[None, :]

    # two guard vectors: convergence of the k-th Ritz vector is governed
    # by the gap to the (block+1)-th eigenvalue, and manifold graphs have
    # near-degenerate pairs right at the cut (measured: the 3rd column
    # leaked toward eigenvector 4 without guards)
    block = n_components + 2
    x0 = jax.random.normal(key, (n, block), jnp.float32)
    x0 = x0 - v0[:, None] * (v0 @ x0)[None, :]
    _, u, _ = lobpcg_standard(bmat, x0, m=m)
    emb = u[:, :n_components]  # descending in B == Laplacian ascending
    emb = emb * (10.0 / jnp.maximum(jnp.max(jnp.abs(emb)), 1e-12))
    noise = jax.random.normal(jax.random.fold_in(key, 1), emb.shape,
                              emb.dtype) * 1e-4
    return (emb + noise).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("n_components",))
def pca_init(x: jnp.ndarray, n_components: int, key: jax.Array) -> jnp.ndarray:
    """PCA initialization (TDAX_UMAP_INIT=pca escape hatch), scaled to
    max-abs 10 with the usual 1e-4 jitter: one [d, d] eigh on the MXU,
    globally faithful, a standard UMAP init choice — but not umap's
    default semantics, which spectral_init_lobpcg provides."""
    mu = jnp.mean(x, axis=0)
    xc = x - mu
    cov = jnp.dot(xc.T, xc, preferred_element_type=jnp.float32)
    _, vecs = jnp.linalg.eigh(cov)          # ascending
    top = vecs[:, -n_components:][:, ::-1]
    emb = jnp.dot(xc, top, preferred_element_type=jnp.float32)
    emb = emb * (10.0 / jnp.maximum(jnp.max(jnp.abs(emb)), 1e-12))
    noise = jax.random.normal(key, emb.shape, emb.dtype) * 1e-4
    return (emb + noise).astype(jnp.float32)


def _layout_edges_impl(init: jnp.ndarray,
                       head: jnp.ndarray, tail: jnp.ndarray,
                       w: jnp.ndarray,
                       n: int, n_epochs: int, key: jax.Array,
                       a: float, b: float,
                       gamma: float = 1.0,
                       initial_alpha: float = 1.0,
                       negative_sample_rate: int = 5,
                       psum_axis: str | None = None) -> jnp.ndarray:
    """layout.py's epoch-synchronous SGD on an edge list.

    Same semantics: per-edge epochs_per_sample schedules, attractive
    gradient -2ab d^(2b-2)/(1+a d^2b) with recoil on tails, negative
    sampling with the zero-distance +4 kick and the zero-distance
    self-draw skip (umap-learn's ``elif j == k: continue``),
    per-dimension clip to [-4, 4], mean-force stabilizer, alpha linear
    to 0.  O(E * neg * d) per epoch via segment sums.

    REQUIRES a symmetric edge list (both directions of every edge with
    equal weight — what build_sym_edges emits): the tail recoil of edge
    (i, j) is exactly minus the attraction of its mirror (j, i) (the
    squared distance, schedule, and activity are direction-invariant),
    so sum-over-tails == -sum-over-heads and the whole recoil reduces to
    doubling the head segment sum — eliminating the one UNSORTED
    scatter-add in the epoch (head-indexed sums ride the sorted fast
    path; a duplicate-heavy unsorted scatter is the worst-lowering op
    on TPU).

    Negative sampling is aggregated PER POINT, not per edge: the
    per-edge schedules still decide how many negatives each edge owes
    each epoch (uncapped, as in umap-learn — the old per-edge tensor
    capped them at neg_rate+3 slots), but instead of gathering an
    [E, neg] block of random rows (the single most expensive op on TPU:
    ~2.2M row-gathers/epoch at 10k points — each row-gather from a
    narrow [n, 3] table moves a full (8, 128) tile), each point draws
    NEG_POOL shared uniform negatives and its repulsion is the sample
    mean scaled by its owed count m_i.  Expectation is identical (the
    owed draws are i.i.d. uniform either way); per-epoch variance grows
    by ~m_i/NEG_POOL, which the 200-500 epoch schedule with decaying
    alpha absorbs (structure tests hold).  Two micro-semantics move
    with it: the ±4 clip bounds each *slot* (so a point's repulsion is
    bounded by 4*m_i either way, at coarser granularity), and the
    zero-distance self-draw skip is per POINT rather than per edge —
    the same convention as umap-learn and the dense path's mean-field
    form; at zero distance vs anything else the +4 kick applies, as
    before."""
    E = head.shape[0]
    a32, b32, g32 = jnp.float32(a), jnp.float32(b), jnp.float32(gamma)
    NEG_POOL = 16

    wmax = jnp.max(w)
    if psum_axis is not None:
        # edges are sharded across the mesh: the schedule normalizer is
        # the GLOBAL max weight
        wmax = jax.lax.pmax(wmax, psum_axis)
    w = jnp.where(w < wmax / n_epochs, 0.0, w)
    n_samples = n_epochs * (w / jnp.maximum(wmax, 1e-30))
    eps = jnp.where(n_samples > 0,
                    n_epochs / jnp.maximum(n_samples, 1e-30), jnp.inf)
    epns = eps / negative_sample_rate
    edge_on = jnp.isfinite(eps)
    self_ix = jnp.arange(n, dtype=jnp.int32)[:, None]

    def epoch_step(state, epoch):
        emb, eons, eonns = state
        alpha = initial_alpha * (1.0 - epoch.astype(jnp.float32) / n_epochs)
        active = edge_on & (eons <= epoch)

        # --- attractive ---
        # one fused row take for both endpoints (head half is sorted)
        he_ta = jnp.take(emb, jnp.concatenate([head, tail]), axis=0)
        diff = he_ta[:E] - he_ta[E:]                              # [E, d]
        d2 = jnp.sum(diff * diff, axis=-1)
        pd2b = jnp.power(jnp.maximum(d2, 1e-12), b32)
        att_coeff = jnp.where(d2 > 0.0,
                              (-2.0 * a32 * b32 * pd2b
                               / jnp.maximum(d2, 1e-12)) / (a32 * pd2b + 1.0),
                              0.0)
        att = jnp.clip(att_coeff[:, None] * diff, -4.0, 4.0)
        att = jnp.where(active[:, None], att, 0.0)

        # per-edge owed negative count (uncapped), aggregated to heads
        n_neg = jnp.where(active,
                          (epoch.astype(jnp.float32) - eonns) / epns, 0.0)
        n_neg_int = jnp.floor(n_neg).astype(jnp.int32)

        # one fused segment sum: [att | active | owed] -> [n, d+2]
        # (symmetric edge list: tail recoil == -(mirror's attraction),
        # so -segment_sum(att, tail) == +segment_sum(att, head) exactly)
        payload = jnp.concatenate(
            [att, active.astype(jnp.float32)[:, None],
             n_neg_int.astype(jnp.float32)[:, None]], axis=1)
        seg = jax.ops.segment_sum(payload, head, num_segments=n,
                                  indices_are_sorted=True)
        if psum_axis is not None:
            # per-device partial sums over the edge shard -> global
            # attraction/count/owed tables on every device; everything
            # downstream (per-point negatives, the update) is identical
            # replicated work, so the embedding stays in lockstep
            seg = jax.lax.psum(seg, psum_axis)
        force = 2.0 * seg[:, :-2]
        cnt = 2.0 * seg[:, -2]
        m = seg[:, -1]                                            # [n] owed

        # --- repulsive (per-point shared pool; only heads move) ---
        k1 = jax.random.fold_in(key, epoch)
        ridx = jax.random.randint(k1, (n, NEG_POOL), 0, n)
        en = jnp.take(emb, ridx.reshape(-1), axis=0).reshape(n, NEG_POOL, -1)
        ndiff = emb[:, None, :] - en                              # [n, P, d]
        nd2 = jnp.sum(ndiff * ndiff, axis=-1)
        npd2b = jnp.power(jnp.maximum(nd2, 1e-12), b32)
        rep_coeff = (2.0 * g32 * b32) / ((0.001 + nd2) * (a32 * npd2b + 1.0))
        rep = jnp.clip(rep_coeff[..., None] * ndiff, -4.0, 4.0)
        zero_d = nd2 <= 0.0
        is_self = ridx == self_ix
        rep = jnp.where((zero_d & ~is_self)[..., None], 4.0, rep)
        on = ~(zero_d & is_self)
        rep = jnp.where(on[..., None], rep, 0.0)
        scale = m / NEG_POOL                                      # [n]
        force = force + jnp.sum(rep, axis=1) * scale[:, None]
        cnt = cnt + jnp.sum(on, axis=1).astype(jnp.float32) * scale

        emb = emb + force / jnp.maximum(cnt, 1.0)[:, None] * alpha
        eons = jnp.where(active, eons + eps, eons)
        eonns = jnp.where(active,
                          eonns + n_neg_int.astype(jnp.float32) * epns, eonns)
        return (emb, eons, eonns), None

    eons0 = jnp.where(edge_on, eps, jnp.inf)
    eonns0 = jnp.where(edge_on, epns, jnp.inf)
    (emb, _, _), _ = jax.lax.scan(epoch_step,
                                  (init.astype(jnp.float32), eons0, eonns0),
                                  jnp.arange(n_epochs, dtype=jnp.int32))
    return emb


optimize_layout_edges = functools.partial(
    jax.jit, static_argnames=("n", "n_epochs", "negative_sample_rate"))(
        functools.partial(_layout_edges_impl, psum_axis=None))


def optimize_layout_edges_sharded(init: jnp.ndarray,
                                  head: jnp.ndarray, tail: jnp.ndarray,
                                  w: jnp.ndarray,
                                  n: int, n_epochs: int, key: jax.Array,
                                  a: float, b: float, mesh,
                                  axis: str = "dp",
                                  gamma: float = 1.0,
                                  initial_alpha: float = 1.0,
                                  negative_sample_rate: int = 5) -> jnp.ndarray:
    """The edge-list layout with the EDGES sharded over the mesh: each
    device owns an edge shard (attraction gathers + segment sums over
    ~E/p edges), partial per-point tables are psum'd over ICI, and the
    replicated embedding updates in lockstep — the per-point negative
    pool uses the same fold_in(key, epoch) stream on every device, so
    the replicated halves stay bit-identical.  The psum's summation
    order differs from the single-device segment sum, so embeddings
    match the unsharded layout to f32 noise (structure, not bitwise).

    Edge-schedule state (eons/eonns) lives WITH the shard.  The edge
    list is padded to a multiple of the axis size with weight-0 edges,
    which the wmax/n_epochs cutoff makes permanently inactive."""
    import math as _math

    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax import shard_map

    p = mesh.shape[axis]
    E = head.shape[0]
    Ep = _math.ceil(E / p) * p
    pad = Ep - E
    if pad:
        head = jnp.concatenate([head, jnp.zeros(pad, head.dtype)])
        tail = jnp.concatenate([tail, jnp.zeros(pad, tail.dtype)])
        w = jnp.concatenate([w, jnp.zeros(pad, w.dtype)])

    worker = functools.partial(
        _layout_edges_impl, n=n, n_epochs=n_epochs, a=a, b=b, gamma=gamma,
        initial_alpha=initial_alpha,
        negative_sample_rate=negative_sample_rate, psum_axis=axis)

    def fn(init_r, head_s, tail_s, w_s, key_r):
        return worker(init_r, head_s, tail_s, w_s, key=key_r)

    sharded = shard_map(fn, mesh=mesh,
                        in_specs=(P(), P(axis), P(axis), P(axis), P()),
                        out_specs=P(), check_vma=False)
    dev = lambda v, spec: jax.device_put(v, NamedSharding(mesh, spec))  # noqa: E731
    return jax.jit(sharded)(dev(init, P()), dev(head, P(axis)),
                            dev(tail, P(axis)), dev(w, P(axis)),
                            key)


def _layout_fixed_tail_impl(init: jnp.ndarray,
                                     tail_emb: jnp.ndarray,
                                     head: jnp.ndarray, tail: jnp.ndarray,
                                     w: jnp.ndarray,
                                     n_epochs: int, key: jax.Array,
                                     a: float, b: float,
                                     gamma: float = 1.0,
                                     initial_alpha: float = 1.0,
                                     negative_sample_rate: int = 5,
                                     head0=0,
                                     neg_rows_global: int | None = None,
                                     neg_rows_pad: int = 0,
                                     wmax_global: float | None = None
                                     ) -> jnp.ndarray:
    """optimize_layout_edges in transform mode: tails stay fixed at
    ``tail_emb`` (the fitted train embedding), only heads (new points)
    move, negatives are drawn from the train set — the edge-list
    counterpart of layout.optimize_layout(move_other=False).

    Negatives use the same per-point aggregation as
    optimize_layout_edges (see its docstring): each new point draws
    NEG_POOL train rows, scaled by its owed count.  Zero-distance draws
    all take the +4 kick here (there is no per-edge tail to exempt; a
    new point exactly atop a train point does not survive the
    weighted-mean init)."""
    E = head.shape[0]
    n_head = init.shape[0]
    n_tail = tail_emb.shape[0]
    a32, b32, g32 = jnp.float32(a), jnp.float32(b), jnp.float32(gamma)
    tail_fixed = tail_emb.astype(jnp.float32)
    NEG_POOL = 16

    # head-sharded mode: the schedule normalizer is the GLOBAL max edge
    # weight, which a shard cannot see — the wrapper passes it in
    wmax = jnp.max(w) if wmax_global is None else jnp.float32(wmax_global)
    w = jnp.where(w < wmax / n_epochs, 0.0, w)
    n_samples = n_epochs * (w / jnp.maximum(wmax, 1e-30))
    eps = jnp.where(n_samples > 0,
                    n_epochs / jnp.maximum(n_samples, 1e-30), jnp.inf)
    epns = eps / negative_sample_rate
    edge_on = jnp.isfinite(eps)

    def epoch_step(state, epoch):
        emb, eons, eonns = state
        alpha = initial_alpha * (1.0 - epoch.astype(jnp.float32) / n_epochs)
        active = edge_on & (eons <= epoch)

        # --- attractive (no recoil: tails are fixed) ---
        diff = emb[head] - tail_fixed[tail]                       # [E, d]
        d2 = jnp.sum(diff * diff, axis=-1)
        pd2b = jnp.power(jnp.maximum(d2, 1e-12), b32)
        att_coeff = jnp.where(d2 > 0.0,
                              (-2.0 * a32 * b32 * pd2b
                               / jnp.maximum(d2, 1e-12)) / (a32 * pd2b + 1.0),
                              0.0)
        att = jnp.clip(att_coeff[:, None] * diff, -4.0, 4.0)
        att = jnp.where(active[:, None], att, 0.0)
        n_neg = jnp.where(active,
                          (epoch.astype(jnp.float32) - eonns) / epns, 0.0)
        n_neg_int = jnp.floor(n_neg).astype(jnp.int32)
        payload = jnp.concatenate(
            [att, active.astype(jnp.float32)[:, None],
             n_neg_int.astype(jnp.float32)[:, None]], axis=1)
        seg = jax.ops.segment_sum(payload, head, num_segments=n_head,
                                  indices_are_sorted=True)
        force = seg[:, :-2]
        cnt = seg[:, -2]
        m = seg[:, -1]

        # --- repulsive (per-point pool from the train set; heads move) ---
        k1 = jax.random.fold_in(key, epoch)
        if neg_rows_global is not None:
            # head-sharded mode: draw the stream in its GLOBAL unpadded
            # shape (so real rows get exactly the single-device draws),
            # extend it with zeros for the shard-grid padding (those
            # rows' results are discarded), and slice this shard's rows
            # — dynamic_slice must never clamp, or real rows would read
            # a shifted window
            ridx_full = jax.random.randint(
                k1, (neg_rows_global, NEG_POOL), 0, n_tail)
            if neg_rows_pad:
                ridx_full = jnp.concatenate(
                    [ridx_full,
                     jnp.zeros((neg_rows_pad, NEG_POOL), ridx_full.dtype)])
            ridx = jax.lax.dynamic_slice(
                ridx_full, (head0, jnp.int32(0)), (n_head, NEG_POOL))
        else:
            ridx = jax.random.randint(k1, (n_head, NEG_POOL), 0, n_tail)
        en = jnp.take(tail_fixed, ridx.reshape(-1),
                      axis=0).reshape(n_head, NEG_POOL, -1)
        ndiff = emb[:, None, :] - en                              # [nh, P, d]
        nd2 = jnp.sum(ndiff * ndiff, axis=-1)
        npd2b = jnp.power(jnp.maximum(nd2, 1e-12), b32)
        rep_coeff = (2.0 * g32 * b32) / ((0.001 + nd2) * (a32 * npd2b + 1.0))
        rep = jnp.clip(rep_coeff[..., None] * ndiff, -4.0, 4.0)
        rep = jnp.where((nd2 <= 0.0)[..., None], 4.0, rep)
        scale = m / NEG_POOL
        force = force + jnp.sum(rep, axis=1) * scale[:, None]
        cnt = cnt + m

        emb = emb + force / jnp.maximum(cnt, 1.0)[:, None] * alpha
        eons = jnp.where(active, eons + eps, eons)
        eonns = jnp.where(active,
                          eonns + n_neg_int.astype(jnp.float32) * epns, eonns)
        return (emb, eons, eonns), None

    eons0 = jnp.where(edge_on, eps, jnp.inf)
    eonns0 = jnp.where(edge_on, epns, jnp.inf)
    (emb, _, _), _ = jax.lax.scan(epoch_step,
                                  (init.astype(jnp.float32), eons0, eonns0),
                                  jnp.arange(n_epochs, dtype=jnp.int32))
    return emb


optimize_layout_edges_fixed_tail = functools.partial(
    jax.jit, static_argnames=("n_epochs", "negative_sample_rate",
                              "neg_rows_global",
                              "neg_rows_pad"))(_layout_fixed_tail_impl)


def optimize_layout_edges_fixed_tail_sharded(
        init: jnp.ndarray, tail_emb: jnp.ndarray,
        head: jnp.ndarray, tail: jnp.ndarray, w: jnp.ndarray,
        n_epochs: int, key: jax.Array, a: float, b: float, mesh,
        axis: str = "dp", gamma: float = 1.0, initial_alpha: float = 1.0,
        negative_sample_rate: int = 5) -> jnp.ndarray:
    """The fixed-tail (transform) layout sharded by NEW POINTS: tails
    are fixed, so each new point's trajectory is independent — every
    device embeds its head shard against the replicated train embedding
    with a purely local segment sum (no collective in the epoch loop at
    all), and the negative stream is drawn in global shape and sliced
    per shard, so the result is BIT-EQUAL to the single-device
    transform.  Requires the transform edge layout (exactly E/n_new
    edges per head, heads contiguous — what transform_sparse builds)."""
    import math as _math

    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax import shard_map

    n_new, dim = init.shape
    E = head.shape[0]
    assert E % n_new == 0, "fixed-tail sharding needs k edges per head"
    k = E // n_new
    p = mesh.shape[axis]
    n_pad = _math.ceil(n_new / p) * p
    pad = n_pad - n_new
    if pad:
        init = jnp.concatenate([init, jnp.zeros((pad, dim), init.dtype)])
        head = jnp.concatenate(
            [head, jnp.repeat(jnp.arange(n_new, n_pad, dtype=head.dtype), k)])
        tail = jnp.concatenate([tail, jnp.zeros(pad * k, tail.dtype)])
        w = jnp.concatenate([w, jnp.zeros(pad * k, w.dtype)])

    wmax_global = float(jnp.max(w))

    def worker(init_s, head_s, tail_s, w_s, tail_emb_r, key_r):
        m = init_s.shape[0]
        row0 = jax.lax.axis_index(axis) * m
        return _layout_fixed_tail_impl(
            init_s, tail_emb_r, head_s - row0, tail_s, w_s, n_epochs,
            key_r, a, b, gamma=gamma, initial_alpha=initial_alpha,
            negative_sample_rate=negative_sample_rate, head0=row0,
            neg_rows_global=n_new, neg_rows_pad=pad,
            wmax_global=wmax_global)

    fn = shard_map(worker, mesh=mesh,
                   in_specs=(P(axis, None), P(axis), P(axis), P(axis),
                             P(), P()),
                   out_specs=P(axis, None))
    dev = lambda v, spec: jax.device_put(v, NamedSharding(mesh, spec))  # noqa: E731
    emb = jax.jit(fn)(dev(init, P(axis, None)), dev(head, P(axis)),
                      dev(tail, P(axis)), dev(w, P(axis)),
                      dev(tail_emb.astype(jnp.float32), P()), key)
    return emb[:n_new]


def transform_sparse(x_new: np.ndarray, train_x: jnp.ndarray,
                     train_emb: np.ndarray, n_neighbors: int, metric: str,
                     n_epochs: int, key: jax.Array,
                     a: float, b: float, learning_rate: float,
                     negative_sample_rate: int, repulsion_strength: float,
                     local_connectivity: float, mesh=None) -> np.ndarray:
    """Embed new points against a fitted reducer on the edge list —
    umap.UMAP.transform semantics (cross-kNN calibration, weighted-mean
    init, fixed-tail SGD at alpha/4) without the [n_new, n_train] dense
    graph or the [nh, nt, neg, d] repulsion tensor."""
    xj = jnp.asarray(np.asarray(x_new), dtype=jnp.float32)
    n_new = xj.shape[0]
    k = n_neighbors
    idx, dists = knn_blocked_cross(xj, train_x, k, metric, mesh=mesh)

    # no self column in cross-kNN: prepend a zero column so the
    # calibration's skip-self convention stays consistent (same as the
    # dense transform path)
    sigma, rho = smooth_knn_dist(
        jnp.concatenate([jnp.zeros((n_new, 1), dists.dtype), dists], axis=1),
        float(k), local_connectivity=local_connectivity)
    d_adj = dists - rho[:, None]
    w = jnp.where(d_adj <= 0.0, 1.0, jnp.exp(-d_adj / sigma[:, None]))

    head = jnp.repeat(jnp.arange(n_new, dtype=jnp.int32), k)
    tail = idx.reshape(-1).astype(jnp.int32)
    wgt = w.reshape(-1).astype(jnp.float32)

    # init: weighted mean of neighbor embeddings
    emb_t = jnp.asarray(train_emb, dtype=jnp.float32)
    wsum = jnp.maximum(jnp.sum(w, axis=1), 1e-12)
    init = jnp.sum(w[:, :, None] * emb_t[idx], axis=1) / wsum[:, None]

    if mesh is not None:
        emb = optimize_layout_edges_fixed_tail_sharded(
            init, emb_t, head, tail, wgt, n_epochs, key, a, b, mesh,
            gamma=repulsion_strength, initial_alpha=learning_rate / 4.0,
            negative_sample_rate=negative_sample_rate)
    else:
        emb = optimize_layout_edges_fixed_tail(
            init, emb_t, head, tail, wgt, n_epochs, key, a, b,
            gamma=repulsion_strength, initial_alpha=learning_rate / 4.0,
            negative_sample_rate=negative_sample_rate)
    return np.asarray(emb)


def embed_sparse(x: np.ndarray, n_neighbors: int, n_components: int,
                 metric: str, n_epochs: int, key: jax.Array,
                 a: float, b: float, learning_rate: float,
                 negative_sample_rate: int, repulsion_strength: float,
                 local_connectivity: float,
                 set_op_mix_ratio: float, mesh=None) -> np.ndarray:
    """One large cloud -> [n, n_components] embedding (edge-list path).

    Per-stage wall-clock lands in ``LAST_TIMINGS`` (diagnostic only)."""
    import time
    t = {}
    t0 = time.time()
    if isinstance(x, jax.Array):
        xj = x if x.dtype == jnp.float32 else x.astype(jnp.float32)
    else:
        xj = jnp.asarray(np.asarray(x), dtype=jnp.float32)
    xj.block_until_ready()
    t["upload_s"] = time.time() - t0
    n = xj.shape[0]
    t0 = time.time()
    idx, dists = knn_blocked(xj, n_neighbors, metric, mesh=mesh)
    sigma, rho = smooth_knn_dist(dists, float(n_neighbors),
                                 local_connectivity=local_connectivity)
    w_knn = membership_strengths_knn(idx, dists, sigma, rho)
    idx_h, w_h = np.asarray(idx), np.asarray(w_knn)
    t["knn_calib_s"] = time.time() - t0
    t0 = time.time()
    head, tail, wgt = build_sym_edges(idx_h, w_h, set_op_mix_ratio)
    head_j = jnp.asarray(head)
    tail_j = jnp.asarray(tail)
    wgt_j = jnp.asarray(wgt)
    t["sym_s"] = time.time() - t0
    k_init, k_layout = jax.random.split(key)
    t0 = time.time()
    # umap-learn's default init='spectral' semantics (the reference runs
    # umap defaults, debug_tda_pipeline.py:96-102); TDAX_UMAP_INIT=pca
    # keeps the cheaper PCA init available for huge clouds
    import os as _os
    if _os.environ.get("TDAX_UMAP_INIT") == "pca":
        init = pca_init(xj, n_components, k_init)
    else:
        init = spectral_init_lobpcg(head_j, tail_j, wgt_j, n,
                                    n_components, k_init)
    init.block_until_ready()
    t["init_s"] = time.time() - t0
    t0 = time.time()
    if mesh is not None:
        emb = optimize_layout_edges_sharded(
            init, head_j, tail_j, wgt_j, n, n_epochs, k_layout, a, b,
            mesh, gamma=repulsion_strength, initial_alpha=learning_rate,
            negative_sample_rate=negative_sample_rate)
    else:
        emb = optimize_layout_edges(init, head_j, tail_j, wgt_j, n, n_epochs,
                                    k_layout, a, b,
                                    gamma=repulsion_strength,
                                    initial_alpha=learning_rate,
                                    negative_sample_rate=negative_sample_rate)
    out = np.asarray(emb)
    t["layout_s"] = time.time() - t0
    LAST_TIMINGS.clear()
    LAST_TIMINGS.update(t)
    return out


#: per-stage wall-clock of the most recent embed_sparse call (diagnostic)
LAST_TIMINGS: dict = {}

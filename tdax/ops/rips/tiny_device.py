"""Batched on-device Vietoris-Rips H0/H1/H2 for tiny clouds.

The headline sweep reduces 32 independent 36-point clouds
(debug_tda_pipeline.py:92-150); the adversarial sweep adds up to 128
more.  Running those through the host C++ engine makes the headline
number a function of the session host's core count (round-2 regression:
1.06 s -> 1.69 s purely from host cores).  At n=36 the whole complex is
630 edges x 7140 triangles x 58905 tetrahedra — small enough to reduce
the dim-2 AND dim-3 boundary matrices ON the device, batched over
clouds in one compiled program (the tet matrix is ~105 MB bit-packed
per cloud at n=36, so the H2 stage chunks the batch to bound HBM).

Algorithm (standard-algorithm pairing, TPU-shaped):
  * total simplex order = ascending (diameter, colex index), the same
    order the oracle/native engines use (rips/reference.py:78,174), so
    the pairing is identical by the pairing-uniqueness theorem;
  * H0 = Boruvka MST (tdax.ops.rips.mst), batched;
  * H1 = reduction of the triangle-by-edge boundary matrix over Z/2,
    H2 = the same reduction of the tet-by-triangle matrix.  Columns are
    bit-packed (16 rows per int32 lane word) and reduced by parallel
    Jacobi sweeps: each sweep computes every column's low, elects the
    earliest column per pivot row, and XORs it into all later columns
    sharing that low — one fully-vectorized [C, W] pass per sweep,
    looped to a fixpoint.  Each XOR strictly lowers a column's low, so
    the sweep count is bounded by the longest elimination chain
    (measured: a few dozen at n=36); at the fixpoint all lows are
    distinct, i.e. the matrix is reduced and the lows ARE the canonical
    persistence pairs.
  * thresh=inf uses the enclosing radius (the complex cones off there;
    diagrams are exact), matching the other backends.

Everything is plain XLA (no host round-trips mid-program), so the same
code path runs on the CPU test mesh and the TPU.
"""

from __future__ import annotations

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp

from tdax.ops.rips.mst import _boruvka

_BITS = 16          # rows per packed word (int32 lanes, values < 2^16)
_MAX_SWEEPS = 4096  # safety bound; convergence flag checked host-side


@functools.lru_cache(maxsize=8)
def _combinatorics(n: int) -> tuple[np.ndarray, np.ndarray]:
    """Static complex structure: edges [E, 2] in colex order (index of
    (i<j) is C(j,2)+i) and triangle->edge ids [T, 3] in colex order."""
    eij = np.array([(i, j) for j in range(n) for i in range(j)],
                   np.int32).reshape(-1, 2)

    def eid(i, j):
        return j * (j - 1) // 2 + i

    tri = np.array([[eid(i, j), eid(i, k), eid(j, k)]
                    for k in range(n) for j in range(k) for i in range(j)],
                   np.int32).reshape(-1, 3)
    return eij, tri


@functools.lru_cache(maxsize=8)
def _combinatorics3(n: int) -> np.ndarray:
    """Tetrahedron -> triangle ids [Q, 4], tets in colex order (index of
    (i<j<k<l) is C(l,4)+C(k,3)+C(j,2)+i), faces as colex triangle ids."""
    def tid(i, j, k):
        return k * (k - 1) * (k - 2) // 6 + j * (j - 1) // 2 + i

    return np.array([[tid(j, k, l), tid(i, k, l), tid(i, j, l), tid(i, j, k)]
                     for l in range(n) for k in range(l)
                     for j in range(k) for i in range(j)],
                    np.int32).reshape(-1, 4)


def _jacobi_reduce(mat: jnp.ndarray):
    """Reduce a bit-packed [L, C, W] Z/2 boundary matrix (columns =
    higher simplices in filtration order, bit r of the packed words =
    row r, rows in filtration order) to distinct lows by parallel
    Jacobi sweeps.  Returns (mat, converged, sweeps)."""
    l_cnt, c_cnt, w_cnt = mat.shape
    pow2 = jnp.asarray(2 ** np.arange(1, _BITS), np.int32)
    w_iota = jnp.arange(w_cnt)[None, None, :]
    col_iota = jnp.broadcast_to(jnp.arange(c_cnt)[None, :], (l_cnt, c_cnt))
    batch_base = jnp.arange(l_cnt)[:, None] * c_cnt     # [L,1]

    # ALL gathers below are flattened axis-0 takes: measured on chip,
    # take_along_axis over a middle axis lowered ~13 ns/element inside
    # the sweep loop (135 ms/sweep) while the same gather as a flat
    # row-take runs at memory speed (10 ms/sweep total).
    def take_rows(m, h):
        """m [L,C,W], h [L,C] column ids -> m[l, h[l,c], :]."""
        idx = (batch_base + h).reshape(-1)
        return jnp.take(m.reshape(l_cnt * c_cnt, w_cnt), idx,
                        axis=0).reshape(l_cnt, c_cnt, w_cnt)

    def take_cols(a, h):
        """a [L,C], h [L,C] -> a[l, h[l,c]]."""
        idx = (batch_base + h).reshape(-1)
        return jnp.take(a.reshape(-1), idx, axis=0).reshape(l_cnt, c_cnt)

    def low_of(m):
        wmax = jnp.max(jnp.where(m > 0, w_iota, -1), axis=-1)         # [L,C]
        flat_idx = ((batch_base + col_iota) * w_cnt
                    + jnp.maximum(wmax, 0)).reshape(-1)
        vw = jnp.take(m.reshape(-1), flat_idx, axis=0).reshape(l_cnt, c_cnt)
        hsb = jnp.sum((vw[..., None] >= pow2).astype(jnp.int32), axis=-1)
        return jnp.where(wmax >= 0, wmax * _BITS + hsb, -1)

    def seg_first(vals, starts):
        # segmented "copy the run's first value forward" scan, axis 1
        def comb(a, b):
            av, af = a
            bv, bf = b
            return jnp.where(bf, bv, av), af | bf

        v, _ = jax.lax.associative_scan(comb, (vals, starts), axis=1)
        return v

    def holders_of(low):
        """For each column, the earliest column sharing its low.

        Scatter-free: a duplicate-index scatter-min serializes on TPU;
        instead STABLE-sort columns by low — equal-low runs keep their
        ascending column order, so each run's FIRST element is the
        holder — propagate it with a segmented scan and map back via
        the inverse permutation.  (Sorting by low alone, stably, equals
        the old low*C+col composite key without its int32 overflow.)"""
        has = low >= 0
        key = jnp.where(has, low, jnp.int32(2 ** 30))
        order = jnp.argsort(key, axis=1, stable=True)   # [L,C] perm
        low_s = take_cols(low, order)
        starts = jnp.concatenate(
            [jnp.ones((l_cnt, 1), bool),
             low_s[:, 1:] != low_s[:, :-1]], axis=1)
        h_s = seg_first(order, starts)                  # sorted cols = order
        inv = jnp.argsort(order, axis=1, stable=True)
        h = take_cols(h_s, inv)                         # original order
        return has, h

    def cond(state):
        _, conflict, it = state
        return conflict & (it < _MAX_SWEEPS)

    def sweep(state):
        m, _, it = state
        low = low_of(m)                                               # [L,C]
        has, h = holders_of(low)
        conflict = has & (h < col_iota)
        mh = take_rows(m, jnp.where(conflict, h, 0))
        m = jnp.where(conflict[..., None], jnp.bitwise_xor(m, mh), m)
        return m, jnp.any(conflict), it + 1

    mat, conflict_final, sweeps = jax.lax.while_loop(
        cond, sweep, (mat, jnp.bool_(True), jnp.int32(0)))
    # the loop exits either because the last sweep found no conflict
    # (converged: all lows distinct) or because it hit _MAX_SWEEPS
    return mat, jnp.logical_not(conflict_final), sweeps, low_of(mat)


def _pack_and_reduce(face_rank, cof_faces, cof_order, cof_valid_sorted,
                     cof_diam_sorted, r_cnt):
    """Build the bit-packed boundary matrix of the cofacets (columns,
    already in filtration order via ``cof_order``) over the faces (rows,
    ranks via ``face_rank``), reduce it, and scatter each pivot's death
    value onto its face row.  Returns (deaths [L, R], converged, sweeps)."""
    l_cnt = face_rank.shape[0]
    c_cnt = cof_faces.shape[0]
    w_cnt = -(-r_cnt // _BITS)

    rows = jnp.take_along_axis(face_rank[:, cof_faces],
                               cof_order[:, :, None], axis=1)   # [L,C,F]
    word, bit = rows // _BITS, rows % _BITS
    li = jnp.arange(l_cnt)[:, None, None]
    ci = jnp.arange(c_cnt)[None, :, None]
    mat = jnp.zeros((l_cnt, c_cnt, w_cnt), jnp.int32).at[li, ci, word].add(
        jnp.left_shift(1, bit)
        * cof_valid_sorted[:, :, None].astype(jnp.int32))

    _, converged, sweeps, low = _jacobi_reduce(mat)
    has = low >= 0
    # at convergence the claimed lows are DISTINCT -> unique-index scatter
    deaths = jnp.full((l_cnt, r_cnt), -jnp.inf).at[
        jnp.arange(l_cnt)[:, None], jnp.where(has, low, 0)].max(
        jnp.where(has, cof_diam_sorted, -jnp.inf), unique_indices=False)
    return deaths, converged, sweeps


def _filtration_sort(diam, valid):
    """Ascending (diameter, colex) order over colex-ordered simplices.
    Returns (order, inverse rank, sorted diameters, sorted validity)."""
    order = jnp.argsort(jnp.where(valid, diam, jnp.inf), axis=-1,
                        stable=True)
    rank = jnp.argsort(order, axis=-1, stable=True)
    return (order, rank, jnp.take_along_axis(diam, order, axis=-1),
            jnp.take_along_axis(valid, order, axis=-1))


@functools.partial(jax.jit, static_argnames=("n",))
def _tiny_h1_pairs(clouds: jnp.ndarray, n: int):
    """clouds [L, n, d] -> (births [L,E] sorted edge diameters,
    deaths [L,E] death value per edge row or -inf, mst [L, n-1],
    converged bool, sweeps int)."""
    eij, tri_e = _combinatorics(n)
    e_cnt = len(eij)

    x = clouds.astype(jnp.float32)
    diff = x[:, :, None, :] - x[:, None, :, :]
    dist = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 0.0))  # [L,n,n]

    mst = jax.vmap(lambda d: _boruvka(d, jnp.float32(np.inf)))(dist)  # [L,n-1]

    radius = jnp.min(jnp.max(dist, axis=-1), axis=-1)                 # [L]
    ed = dist[:, eij[:, 0], eij[:, 1]]                                # [L,E]
    td = jnp.max(ed[:, tri_e], axis=-1)                               # [L,T]

    _, e_rank, ed_sorted, _ = _filtration_sort(ed, ed <= radius[:, None])
    t_order, _, td_sorted, tv_sorted = _filtration_sort(
        td, td <= radius[:, None])

    deaths, converged, sweeps = _pack_and_reduce(
        e_rank, tri_e, t_order, tv_sorted, td_sorted, e_cnt)
    return ed_sorted, deaths, mst, converged, sweeps


@functools.partial(jax.jit, static_argnames=("n",))
def _tiny_h2_pairs(clouds: jnp.ndarray, n: int):
    """clouds [L, n, d] -> (births [L,T] sorted triangle diameters,
    deaths [L,T] death value per triangle row or -inf, converged,
    sweeps).  Reduces the tetrahedron-by-triangle boundary matrix; the
    pairing-disjointness of the standard algorithm guarantees every
    pivot row is a positive (cycle-creating) triangle, so the lows ARE
    the H2 pairs — no cross-check against the dim-2 reduction needed."""
    eij, tri_e = _combinatorics(n)
    tet_t = _combinatorics3(n)
    t_cnt = len(tri_e)

    x = clouds.astype(jnp.float32)
    diff = x[:, :, None, :] - x[:, None, :, :]
    dist = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 0.0))

    radius = jnp.min(jnp.max(dist, axis=-1), axis=-1)                 # [L]
    ed = dist[:, eij[:, 0], eij[:, 1]]                                # [L,E]
    td = jnp.max(ed[:, tri_e], axis=-1)                               # [L,T]
    qd = jnp.max(td[:, tet_t], axis=-1)                               # [L,Q]

    _, t_rank, td_sorted, _ = _filtration_sort(td, td <= radius[:, None])
    q_order, _, qd_sorted, qv_sorted = _filtration_sort(
        qd, qd <= radius[:, None])

    deaths, converged, sweeps = _pack_and_reduce(
        t_rank, tet_t, q_order, qv_sorted, qd_sorted, t_cnt)
    return td_sorted, deaths, converged, sweeps


def _pairs_to_dgm(births: np.ndarray, deaths: np.ndarray) -> np.ndarray:
    """Positive-persistence (birth, death) rows, diagram-sorted."""
    keep = deaths > births
    dgm = np.stack([births[keep], deaths[keep]], axis=1).reshape(-1, 2)
    if len(dgm):
        dgm = dgm[np.lexsort((dgm[:, 1], dgm[:, 0]))]
    return dgm


def _h2_chunk_size(l_cnt: int, n: int) -> int:
    """Clouds per compiled H2 program.  The tet-by-triangle matrix is
    C(n,4) x ceil(C(n,3)/16) int32 words (~105 MB at n=36) and the sweep
    keeps ~4 live copies (matrix, gathered holders, xor result, scatter
    temp); bound the chunk so the working set stays ~3.5 GB unless
    TDAX_TINY_H2_CHUNK overrides."""
    env = os.environ.get("TDAX_TINY_H2_CHUNK")
    if env:
        return max(1, min(l_cnt, int(env)))
    q_cnt = n * (n - 1) * (n - 2) * (n - 3) // 24
    w_cnt = -(-(n * (n - 1) * (n - 2) // 6) // _BITS)
    per_cloud = q_cnt * w_cnt * 4 * 4
    return max(1, min(l_cnt, int(3.5e9 // max(per_cloud, 1))))


def rips_tiny_batched(clouds, maxdim: int = 1) -> list[list[np.ndarray]]:
    """VR diagrams [dgm0, ..., dgm_maxdim] for each cloud in a [L, n, d]
    batch — one compiled device program per homology dimension for the
    whole batch (H2 chunks the batch to bound the tet matrix's HBM).
    maxdim <= 2; the headline sweep uses maxdim=1
    (debug_tda_pipeline.py:21), ripser's default
    (/root/reference uses ripser(cloud, maxdim=1))."""
    if maxdim not in (0, 1, 2):
        raise ValueError("rips_tiny_batched supports maxdim <= 2")
    clouds = jnp.asarray(clouds)
    l_cnt, n = clouds.shape[0], clouds.shape[1]
    # memory bound, not correctness: the H1 triangle matrix at n=100 is
    # ~200 MB/cloud; past that the native engine is the right backend
    # (the reduction itself has no n limit since the holder election
    # sorts by low alone, stable — no composite-key overflow)
    if n > 100:
        raise ValueError(
            f"rips_tiny_batched is limited to n <= 100 points (got {n}): "
            "use the native engine for larger clouds")
    if maxdim == 2 and n > 48:
        raise ValueError(
            f"rips_tiny_batched maxdim=2 is limited to n <= 48 (got {n}): "
            "the tet-by-triangle matrix is ~840 MB/cloud at n=48; use "
            "the native engine")

    births, deaths, mst, converged, _ = _tiny_h1_pairs(clouds, n)
    if not bool(converged):  # pragma: no cover - safety net
        raise RuntimeError("tiny-device rips reduction did not converge "
                           f"within {_MAX_SWEEPS} sweeps")
    births = np.asarray(births, np.float64)
    deaths = np.asarray(deaths, np.float64)
    mst = np.asarray(mst, np.float64)

    if maxdim == 2:
        chunk = _h2_chunk_size(l_cnt, n)
        b2_parts, d2_parts = [], []
        for s in range(0, l_cnt, chunk):
            # pad the tail chunk (repeat cloud 0) so every dispatch
            # reuses one compiled shape
            part = clouds[s:s + chunk]
            pad = chunk - part.shape[0]
            if pad:
                part = jnp.concatenate(
                    [part, jnp.broadcast_to(clouds[:1],
                                            (pad,) + clouds.shape[1:])])
            b2, d2, conv2, _ = _tiny_h2_pairs(part, n)
            if not bool(conv2):  # pragma: no cover - safety net
                raise RuntimeError(
                    "tiny-device H2 reduction did not converge within "
                    f"{_MAX_SWEEPS} sweeps")
            take = min(chunk, l_cnt - s)
            b2_parts.append(np.asarray(b2, np.float64)[:take])
            d2_parts.append(np.asarray(d2, np.float64)[:take])
        births2 = np.concatenate(b2_parts)
        deaths2 = np.concatenate(d2_parts)

    out: list[list[np.ndarray]] = []
    for l in range(l_cnt):
        w = mst[l]
        finite = w[np.isfinite(w)]
        finite = finite[finite > 0]
        n_comp = 1 + int(np.sum(~np.isfinite(w)))
        dgm0 = np.asarray([[0.0, float(v)] for v in np.sort(finite)]
                          + [[0.0, np.inf]] * n_comp).reshape(-1, 2)
        dgms = [dgm0]
        if maxdim >= 1:
            dgms.append(_pairs_to_dgm(births[l], deaths[l]))
        if maxdim >= 2:
            dgms.append(_pairs_to_dgm(births2[l], deaths2[l]))
        out.append(dgms)
    return out

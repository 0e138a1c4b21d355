"""Batched on-device Vietoris-Rips H0/H1 for tiny clouds.

The headline sweep reduces 32 independent 36-point clouds
(debug_tda_pipeline.py:92-150); the adversarial sweep adds up to 128
more.  Running those through the host C++ engine makes the headline
number a function of the session host's core count (round-2 regression:
1.06 s -> 1.69 s purely from host cores).  At n=36 the whole complex is
630 edges x 7140 triangles — small enough to reduce the dim-2 boundary
matrix ON the device, batched over all clouds in one compiled program.

Algorithm (standard-algorithm pairing, TPU-shaped):
  * total simplex order = ascending (diameter, colex index), the same
    order the oracle/native engines use (rips/reference.py:78,174), so
    the pairing is identical by the pairing-uniqueness theorem;
  * H0 = Boruvka MST (tdax.ops.rips.mst), batched;
  * H1 = reduction of the triangle-by-edge boundary matrix over Z/2.
    Columns are bit-packed (16 rows per int32 lane word) and reduced by
    parallel Jacobi sweeps: each sweep computes every column's low,
    elects the earliest column per pivot row, and XORs it into all
    later columns sharing that low — one fully-vectorized [T, W] pass
    per sweep, looped to a fixpoint.  Each XOR strictly lowers a
    column's low, so the sweep count is bounded by the longest
    elimination chain (measured: a few dozen at n=36); at the fixpoint
    all lows are distinct, i.e. the matrix is reduced and the lows ARE
    the canonical persistence pairs.
  * thresh=inf uses the enclosing radius (the complex cones off there;
    diagrams are exact), matching the other backends.

Everything is plain XLA (no host round-trips mid-program), so the same
code path runs on the CPU test mesh and the TPU.
"""

from __future__ import annotations

import functools

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


@functools.partial(jax.jit, static_argnames=("n",))
def _tiny_h1_pairs(clouds: jnp.ndarray, n: int):
    """clouds [L, n, d] -> (births [L,E] sorted edge diameters,
    deaths [L,E] death value per edge row or -inf, mst [L, n-1],
    converged bool, sweeps int)."""
    eij, tri_e = _combinatorics(n)
    e_cnt, t_cnt = len(eij), len(tri_e)
    w_cnt = -(-e_cnt // _BITS)
    l_cnt = clouds.shape[0]

    x = clouds.astype(jnp.float32)
    diff = x[:, :, None, :] - x[:, None, :, :]
    dist = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 0.0))  # [L,n,n]

    mst = jax.vmap(lambda d: _boruvka(d, jnp.float32(np.inf)))(dist)  # [L,n-1]

    radius = jnp.min(jnp.max(dist, axis=-1), axis=-1)                 # [L]
    ed = dist[:, eij[:, 0], eij[:, 1]]                                # [L,E]
    td = jnp.max(ed[:, tri_e], axis=-1)                               # [L,T]
    e_valid = ed <= radius[:, None]
    t_valid = td <= radius[:, None]

    # ascending (diameter, colex): arrays are colex-ordered, stable sort
    e_order = jnp.argsort(jnp.where(e_valid, ed, jnp.inf), axis=-1,
                          stable=True)
    ed_sorted = jnp.take_along_axis(ed, e_order, axis=-1)
    e_rank = jnp.argsort(e_order, axis=-1, stable=True)  # inverse perm

    t_order = jnp.argsort(jnp.where(t_valid, td, jnp.inf), axis=-1,
                          stable=True)
    td_sorted = jnp.take_along_axis(td, t_order, axis=-1)
    tv_sorted = jnp.take_along_axis(t_valid, t_order, axis=-1)

    rows = jnp.take_along_axis(e_rank[:, tri_e], t_order[:, :, None],
                               axis=1)                                # [L,T,3]
    word, bit = rows // _BITS, rows % _BITS

    li = jnp.arange(l_cnt)[:, None, None]
    ti = jnp.arange(t_cnt)[None, :, None]
    mat = jnp.zeros((l_cnt, t_cnt, w_cnt), jnp.int32).at[li, ti, word].add(
        jnp.left_shift(1, bit) * tv_sorted[:, :, None].astype(jnp.int32))

    pow2 = jnp.asarray(2 ** np.arange(1, _BITS), np.int32)
    w_iota = jnp.arange(w_cnt)[None, None, :]
    col_iota = jnp.broadcast_to(jnp.arange(t_cnt)[None, :], (l_cnt, t_cnt))
    big_key = jnp.int32(np.int32(2 ** 30))
    batch_base = jnp.arange(l_cnt)[:, None] * t_cnt     # [L,1]

    # ALL gathers below are flattened axis-0 takes: measured on chip,
    # take_along_axis over a middle axis lowered ~13 ns/element inside
    # the sweep loop (135 ms/sweep) while the same gather as a flat
    # row-take runs at memory speed (10 ms/sweep total).
    def take_rows(m, h):
        """m [L,T,W], h [L,T] column ids -> m[l, h[l,t], :]."""
        idx = (batch_base + h).reshape(-1)
        return jnp.take(m.reshape(l_cnt * t_cnt, w_cnt), idx,
                        axis=0).reshape(l_cnt, t_cnt, w_cnt)

    def take_cols(a, h):
        """a [L,T], h [L,T] -> a[l, h[l,t]]."""
        idx = (batch_base + h).reshape(-1)
        return jnp.take(a.reshape(-1), idx, axis=0).reshape(l_cnt, t_cnt)

    def low_of(m):
        wmax = jnp.max(jnp.where(m > 0, w_iota, -1), axis=-1)         # [L,T]
        flat_idx = ((batch_base + col_iota) * w_cnt
                    + jnp.maximum(wmax, 0)).reshape(-1)
        vw = jnp.take(m.reshape(-1), flat_idx, axis=0).reshape(l_cnt, t_cnt)
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
        instead sort columns by (low, col) — stable, so each low-run is
        col-ascending and its FIRST element is the holder — propagate it
        with a segmented scan and map back via the inverse permutation."""
        has = low >= 0
        key = jnp.where(has, low * t_cnt + col_iota, big_key)
        order = jnp.argsort(key, axis=1)                # [L,T] perm
        low_s = take_cols(low, order)
        starts = jnp.concatenate(
            [jnp.ones((l_cnt, 1), bool),
             low_s[:, 1:] != low_s[:, :-1]], axis=1)
        h_s = seg_first(order, starts)                  # sorted cols = order
        inv = jnp.argsort(order, axis=1)
        h = take_cols(h_s, inv)                         # original order
        return has, h

    def cond(state):
        _, conflict, it = state
        return conflict & (it < _MAX_SWEEPS)

    def sweep(state):
        m, _, it = state
        low = low_of(m)                                               # [L,T]
        has, h = holders_of(low)
        conflict = has & (h < col_iota)
        mh = take_rows(m, jnp.where(conflict, h, 0))
        m = jnp.where(conflict[..., None], jnp.bitwise_xor(m, mh), m)
        return m, jnp.any(conflict), it + 1

    mat, conflict_final, sweeps = jax.lax.while_loop(
        cond, sweep, (mat, jnp.bool_(True), jnp.int32(0)))
    # the loop exits either because the last sweep found no conflict
    # (converged: all lows distinct) or because it hit _MAX_SWEEPS
    converged = jnp.logical_not(conflict_final)

    low = low_of(mat)
    has = low >= 0
    # at convergence the claimed lows are DISTINCT -> unique-index scatter
    deaths = jnp.full((l_cnt, e_cnt), -jnp.inf).at[
        jnp.arange(l_cnt)[:, None], jnp.where(has, low, 0)].max(
        jnp.where(has, td_sorted, -jnp.inf), unique_indices=False)
    return ed_sorted, deaths, mst, converged, sweeps


def rips_tiny_batched(clouds, maxdim: int = 1) -> list[list[np.ndarray]]:
    """VR diagrams [dgm0, dgm1] for each cloud in a [L, n, d] batch —
    one compiled device program for the whole batch.  maxdim must be 1
    (the headline sweep's configuration, debug_tda_pipeline.py:21)."""
    if maxdim != 1:
        raise ValueError("rips_tiny_batched supports maxdim=1 only")
    clouds = jnp.asarray(clouds)
    l_cnt, n = clouds.shape[0], clouds.shape[1]
    # the holder election's int32 sort key is low * C(n,3) + col with
    # low < C(n,2); it must stay below the 2**30 invalid marker, which
    # holds through n = 100 (C(100,2)*C(100,3) ~ 8.0e8) and overflows
    # past it — this path is for tiny clouds, so bound it explicitly
    # rather than silently corrupting a forced backend='device' call
    if n > 100:
        raise ValueError(
            f"rips_tiny_batched is limited to n <= 100 points (got {n}): "
            "the on-device election key is int32; use the native engine")
    births, deaths, mst, converged, _ = _tiny_h1_pairs(clouds, n)
    if not bool(converged):  # pragma: no cover - safety net
        raise RuntimeError("tiny-device rips reduction did not converge "
                           f"within {_MAX_SWEEPS} sweeps")
    births = np.asarray(births, np.float64)
    deaths = np.asarray(deaths, np.float64)
    mst = np.asarray(mst, np.float64)

    out: list[list[np.ndarray]] = []
    for l in range(l_cnt):
        w = mst[l]
        finite = w[np.isfinite(w)]
        finite = finite[finite > 0]
        n_comp = 1 + int(np.sum(~np.isfinite(w)))
        dgm0 = np.asarray([[0.0, float(v)] for v in np.sort(finite)]
                          + [[0.0, np.inf]] * n_comp).reshape(-1, 2)

        keep = deaths[l] > births[l]
        dgm1 = np.stack([births[l][keep], deaths[l][keep]],
                        axis=1).reshape(-1, 2)
        if len(dgm1):
            dgm1 = dgm1[np.lexsort((dgm1[:, 1], dgm1[:, 0]))]
        out.append([dgm0, dgm1])
    return out

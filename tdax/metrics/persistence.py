"""Persistence-diagram summary metrics.

``get_persistence`` mirrors the reference's helper exactly
(debug_tda_pipeline.py:79-89): finite lifetimes + their max.
``diagram_stats`` packages the reference's per-layer stats schema
(debug_tda_pipeline.py:121-130).  ``bottleneck_distance`` implements
the persim-contract metric named by BASELINE.json as the parity bar:
exact bottleneck via binary search over candidate costs + bipartite
matching feasibility (Hopcroft–Karp), host-side numpy (diagrams are
tiny; the heavy work already happened in the PH engine).
"""

from __future__ import annotations

import numpy as np


def get_persistence(dgm: np.ndarray) -> tuple[np.ndarray, float]:
    """(finite lifetimes, max lifetime) — reference debug_tda_pipeline.py:79-89."""
    dgm = np.asarray(dgm).reshape(-1, 2)
    if dgm.shape[0] == 0:
        return np.array([]), 0.0
    pers = dgm[:, 1] - dgm[:, 0]
    pers = pers[np.isfinite(pers)]
    if pers.shape[0] == 0:
        return np.array([]), 0.0
    return pers, float(np.max(pers))


def diagram_stats(dgms: list[np.ndarray], layer: int | None = None) -> dict:
    """Per-layer stats dict with the reference's exact key schema."""
    h0, h1 = dgms[0], dgms[1] if len(dgms) > 1 else np.zeros((0, 2))
    h0_pers, max_h0 = get_persistence(h0)
    h1_pers, max_h1 = get_persistence(h1)
    stats = {
        "n_h1_features": int(len(h1_pers)),
        "max_h1_persistence": float(max_h1),
        "all_h1_persistence_values": [float(v) for v in h1_pers],
        "n_h0_features": int(len(h0) - len(h0_pers)),  # infinite bars
        "max_h0_persistence": float(max_h0),
    }
    if layer is not None:
        stats = {"layer": int(layer), **stats}
    return stats


# --- bottleneck distance ------------------------------------------------------

def _feasible(cost: np.ndarray, eps: float) -> bool:
    """Is there a perfect matching using only edges with cost <= eps?
    Hopcroft-Karp style augmenting paths on the boolean graph."""
    n, m = cost.shape
    adj = cost <= eps
    match_l = np.full(n, -1)
    match_r = np.full(m, -1)

    def try_augment(u: int, seen: np.ndarray) -> bool:
        for v in np.flatnonzero(adj[u]):
            if seen[v]:
                continue
            seen[v] = True
            if match_r[v] == -1 or try_augment(match_r[v], seen):
                match_l[u] = v
                match_r[v] = u
                return True
        return False

    for u in range(n):
        if not try_augment(u, np.zeros(m, dtype=bool)):
            return False
    return True


def bottleneck_distance(dgm_a: np.ndarray, dgm_b: np.ndarray) -> float:
    """Exact bottleneck distance between two diagrams (L-inf ground metric,
    points matchable to the diagonal).  Infinite-death points must match
    each other exactly by birth (else distance is inf).

    Small diagrams take the dense augmented-matrix path below; past
    ~2k total bars the call dispatches to ``bottleneck_distance_sparse``
    (same realized-cost answer — unit-tested equal — via grid-hashed
    feasibility instead of an O((n+m)^2) matrix)."""
    a = np.asarray(dgm_a, dtype=np.float64).reshape(-1, 2)
    b = np.asarray(dgm_b, dtype=np.float64).reshape(-1, 2)
    if len(a) + len(b) > 2048:
        return bottleneck_distance_sparse(a, b)

    a_inf, b_inf = a[np.isinf(a[:, 1])], b[np.isinf(b[:, 1])]
    a, b = a[np.isfinite(a[:, 1])], b[np.isfinite(b[:, 1])]
    inf_cost = 0.0
    if len(a_inf) or len(b_inf):
        if len(a_inf) != len(b_inf):
            return float("inf")
        inf_cost = float(np.max(np.abs(np.sort(a_inf[:, 0]) - np.sort(b_inf[:, 0])))) \
            if len(a_inf) else 0.0

    n, m = len(a), len(b)
    if n == 0 and m == 0:
        return inf_cost

    # augmented bipartite problem: each point may match the diagonal
    size = n + m
    cost = np.full((size, size), np.inf)
    if n and m:
        cost[:n, :m] = np.max(np.abs(a[:, None, :] - b[None, :, :]), axis=-1)
    diag_a = (a[:, 1] - a[:, 0]) / 2.0 if n else np.zeros(0)
    diag_b = (b[:, 1] - b[:, 0]) / 2.0 if m else np.zeros(0)
    for i in range(n):
        cost[i, m + i] = diag_a[i]
    for j in range(m):
        cost[n + j, j] = diag_b[j]
    cost[n:, m:] = 0.0  # diagonal-to-diagonal free

    candidates = np.unique(cost[np.isfinite(cost)])
    lo, hi = 0, len(candidates) - 1
    while lo < hi:
        mid = (lo + hi) // 2
        if _feasible(cost, candidates[mid]):
            hi = mid
        else:
            lo = mid + 1
    return max(float(candidates[lo]), inf_cost)


# --- bottleneck at scale ------------------------------------------------------
#
# The exact implementation above builds a dense (n+m)^2 augmented cost
# matrix — infeasible at the scale path's 10k-60k-bar diagrams
# (README.md:127-128).  The sparse path below exploits the structure of
# the problem instead of the matrix:
#
#   feasibility(eps) — "is bottleneck <= eps" — reduces to: does a
#   matching exist in the bipartite graph {(a, b): Linf(a, b) <= eps}
#   saturating A' = {a: pers_a > 2 eps} and B' = {b: pers_b > 2 eps}?
#   (Everything else can pair with the diagonal for free; the counting
#   argument balances exactly.)  By the Mendelsohn–Dulmage theorem that
#   holds iff a matching saturating A' exists AND one saturating B'
#   exists — two independent one-sided Hopcroft–Karp runs.  Neighbor
#   candidates come from vectorized birth-sorted searchsorted windows
#   (_pairs_within), so each check costs ~(high-persistence bars x
#   their eps-window neighbors), never n*m.
#
#   The search is numeric bisection on [0, max pers/2] (all-diagonal is
#   always feasible) down to a relative window, then an exact finish:
#   collect the few realized candidate costs (pair Linf distances and
#   pers/2 values) inside the final window and bisect over THOSE — the
#   returned value is an exactly-realized cost, same contract as the
#   dense implementation.

def _pairs_within(pts_a: np.ndarray, pts_b: np.ndarray, eps: float):
    """(ai, bj) index arrays of every pair with Linf <= eps, fully
    vectorized: sorted searchsorted windows on ONE coordinate then an
    exact filter.  The window coordinate is whichever axis spreads the
    points more — H0 diagrams have ALL-ZERO births, where a
    birth-window would degenerate to all-pairs (measured: a 17-minute
    gate on 10k H0 bars); their deaths spread fine.  Candidate volume
    self-limits across the bisection: at large eps the caller's
    required set {pers > 2 eps} is small, at small eps the windows
    are."""
    ax = int(np.argmax(np.ptp(pts_b, axis=0))) if len(pts_b) else 0
    order = np.argsort(pts_b[:, ax], kind="stable")
    births = pts_b[order, ax]
    lo = np.searchsorted(births, pts_a[:, ax] - eps, side="left")
    hi = np.searchsorted(births, pts_a[:, ax] + eps, side="right")
    counts = hi - lo
    total = int(counts.sum())
    if total == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z
    ai = np.repeat(np.arange(len(pts_a)), counts)
    within = np.arange(total) - np.repeat(np.cumsum(counts) - counts, counts)
    bj = order[np.repeat(lo, counts) + within]
    keep = np.abs(pts_b[bj, 1] - pts_a[ai, 1]) <= eps
    keep &= np.abs(pts_b[bj, 0] - pts_a[ai, 0]) <= eps  # exact Linf check
    return ai[keep], bj[keep]


def _hk_saturates(adj: list[list[int]], n_right: int) -> bool:
    """Hopcroft–Karp; True iff a matching saturates EVERY left vertex.
    Iterative (the recursive exact-path DFS overflows at scale)."""
    INF = float("inf")
    n_left = len(adj)
    match_l = [-1] * n_left
    match_r = [-1] * n_right
    dist = [0.0] * n_left

    from collections import deque

    def bfs() -> bool:
        q = deque()
        for u in range(n_left):
            if match_l[u] == -1:
                dist[u] = 0.0
                q.append(u)
            else:
                dist[u] = INF
        found = False
        while q:
            u = q.popleft()
            for v in adj[u]:
                w = match_r[v]
                if w == -1:
                    found = True
                elif dist[w] == INF:
                    dist[w] = dist[u] + 1
                    q.append(w)
        return found

    def dfs(root: int) -> bool:
        stack = [(root, iter(adj[root]))]
        path = []
        while stack:
            u, it = stack[-1]
            advanced = False
            for v in it:
                w = match_r[v]
                if w == -1:
                    path.append((u, v))
                    for uu, vv in path:
                        match_l[uu] = vv
                        match_r[vv] = uu
                    for uu, _ in stack:
                        dist[uu] = INF
                    return True
                if dist[w] == dist[u] + 1:
                    path.append((u, v))
                    stack.append((w, iter(adj[w])))
                    advanced = True
                    break
            if not advanced:
                dist[u] = INF
                stack.pop()
                if path:  # drop the edge that led into u (root has none)
                    path.pop()
        return False

    matched = 0
    while bfs():
        for u in range(n_left):
            if match_l[u] == -1 and dfs(u):
                matched += 1
    if matched < n_left:
        return False
    return all(m != -1 for m in match_l)


def _side_saturable(req_pts: np.ndarray, other: np.ndarray, eps: float) -> bool:
    """Can every required point match a distinct other-side point
    within Linf eps?"""
    if len(req_pts) == 0:
        return True
    if len(other) == 0:
        return False
    ai, bj = _pairs_within(req_pts, other, eps)
    # every required point needs at least one candidate at all
    deg = np.bincount(ai, minlength=len(req_pts))
    if (deg == 0).any():
        return False
    # compact right labels, group candidate lists per left vertex
    uniq, bj_c = np.unique(bj, return_inverse=True)
    order = np.argsort(ai, kind="stable")
    splits = np.cumsum(deg)[:-1]
    adj = [c.tolist() for c in np.split(bj_c[order], splits)]
    return _hk_saturates(adj, len(uniq))


def _bn_feasible(a: np.ndarray, b: np.ndarray, pa: np.ndarray,
                 pb: np.ndarray, eps: float) -> bool:
    a_hi = a[pa > 2.0 * eps]
    b_hi = b[pb > 2.0 * eps]
    return (_side_saturable(a_hi, b, eps)
            and _side_saturable(b_hi, a, eps))


def bottleneck_distance_sparse(dgm_a: np.ndarray, dgm_b: np.ndarray,
                               rel_tol: float = 1e-12) -> float:
    """Bottleneck distance for LARGE diagrams (10k+ bars): grid-hashed
    candidate neighbors + one-sided Hopcroft–Karp feasibility (see the
    block comment above).  Returns an exactly-realized cost; agrees
    with ``bottleneck_distance`` (unit-tested on mid-size diagrams).
    Infinite-death bars follow the same convention as the dense path:
    they must pair across diagrams by sorted birth."""
    a = np.asarray(dgm_a, dtype=np.float64).reshape(-1, 2)
    b = np.asarray(dgm_b, dtype=np.float64).reshape(-1, 2)

    a_inf, b_inf = a[np.isinf(a[:, 1])], b[np.isinf(b[:, 1])]
    a, b = a[np.isfinite(a[:, 1])], b[np.isfinite(b[:, 1])]
    if len(a_inf) != len(b_inf):
        return float("inf")
    inf_cost = float(np.max(np.abs(np.sort(a_inf[:, 0])
                                   - np.sort(b_inf[:, 0])))) \
        if len(a_inf) else 0.0
    if len(a) == 0 and len(b) == 0:
        return inf_cost

    pa = a[:, 1] - a[:, 0]
    pb = b[:, 1] - b[:, 0]
    hi = float(max(pa.max(initial=0.0), pb.max(initial=0.0))) / 2.0  # all-diag
    if hi == 0.0 or _bn_feasible(a, b, pa, pb, 0.0):
        return max(0.0, inf_cost)

    # sound lower bound: every point pays at least min(its diagonal
    # cost, its nearest cross-diagram Linf neighbor), so bottleneck >=
    # the max of that over both diagrams.  For near-twin diagrams (the
    # cross-engine gate's regime) this IS the answer, so the bisection
    # below starts at its doorstep instead of spending feasibility
    # checks in the mid-eps zone where half the bars are "required"
    # and candidate windows are huge (measured: a 30k H0-shaped case
    # went from minutes of mid-range Hopcroft-Karp to seconds).
    from scipy.spatial import cKDTree

    lb = 0.0
    if len(a) and len(b):
        ta, tb = cKDTree(a), cKDTree(b)
        lb = max(
            float(np.max(np.minimum(tb.query(a, k=1, p=np.inf)[0],
                                    pa / 2.0), initial=0.0)),
            float(np.max(np.minimum(ta.query(b, k=1, p=np.inf)[0],
                                    pb / 2.0), initial=0.0)))
    else:  # one side empty: everything diagonal-matches
        lb = hi
    if lb > 0.0 and _bn_feasible(a, b, pa, pb, lb):
        return max(lb, inf_cost)  # the bound is attained and realized
    lo = lb

    def window_bound() -> int:
        """Cheap overcount of realized costs in (lo, hi]: pers/2 values
        in the window + birth-window pair count (searchsorted only —
        no pair materialization)."""
        c = int(((pa > 2.0 * lo) & (pa <= 2.0 * hi)).sum())
        c += int(((pb > 2.0 * lo) & (pb <= 2.0 * hi)).sum())
        births = np.sort(b[:, 0])
        c += int((np.searchsorted(births, a[:, 0] + hi, side="right")
                  - np.searchsorted(births, a[:, 0] - hi, side="left")).sum())
        return c

    # numeric bisection, but hand off to the exact discrete phase as
    # soon as the window's realized costs materialize affordably —
    # discrete bisection over C candidates costs log2(C) feasibility
    # checks, vs ~40+ numeric halvings to rel_tol, so the handoff wins
    # long before the window is narrow
    while hi - lo > max(rel_tol * hi, 1e-300):
        if window_bound() <= 200_000:
            break
        mid = 0.5 * (lo + hi)
        if mid == lo or mid == hi:
            break
        if _bn_feasible(a, b, pa, pb, mid):
            hi = mid
        else:
            lo = mid

    # exact finish: bisect over the realized costs inside (lo, hi]
    parts = [pa[(pa > 2.0 * lo) & (pa <= 2.0 * hi)] / 2.0,
             pb[(pb > 2.0 * lo) & (pb <= 2.0 * hi)] / 2.0]
    if len(a) and len(b):
        ai, bj = _pairs_within(a, b, hi)
        d = np.max(np.abs(a[ai] - b[bj]), axis=1)
        parts.append(d[(d > lo) & (d <= hi)])
    cand_list = np.unique(np.concatenate(parts))
    lo_i, hi_i = 0, len(cand_list) - 1
    while lo_i < hi_i:
        mid_i = (lo_i + hi_i) // 2
        if _bn_feasible(a, b, pa, pb, float(cand_list[mid_i])):
            hi_i = mid_i
        else:
            lo_i = mid_i + 1
    return max(float(cand_list[lo_i]), inf_cost)


def wasserstein_distance(dgm_a: np.ndarray, dgm_b: np.ndarray,
                         order: float = 1.0) -> float:
    """Exact q-Wasserstein distance between diagrams (L-inf ground metric,
    diagonal matching allowed) via optimal assignment on the augmented
    bipartite cost matrix (scipy Hungarian).  Infinite bars must pair
    across diagrams (by sorted birth) or the distance is inf."""
    from scipy.optimize import linear_sum_assignment

    a = np.asarray(dgm_a, dtype=np.float64).reshape(-1, 2)
    b = np.asarray(dgm_b, dtype=np.float64).reshape(-1, 2)

    a_inf, b_inf = a[np.isinf(a[:, 1])], b[np.isinf(b[:, 1])]
    a, b = a[np.isfinite(a[:, 1])], b[np.isfinite(b[:, 1])]
    if len(a_inf) != len(b_inf):
        return float("inf")
    inf_cost = float(np.sum(np.abs(np.sort(a_inf[:, 0]) - np.sort(b_inf[:, 0])) ** order)) \
        if len(a_inf) else 0.0

    n, m = len(a), len(b)
    if n == 0 and m == 0:
        return inf_cost ** (1.0 / order) if order != 1.0 else inf_cost

    size = n + m
    cost = np.zeros((size, size))
    if n and m:
        cost[:n, :m] = np.max(np.abs(a[:, None, :] - b[None, :, :]), axis=-1) ** order
    big = cost.max() * 10 + 1.0 if n and m else 1.0
    cost[:n, m:] = big
    cost[n:, :m] = big
    for i in range(n):
        cost[i, m + i] = ((a[i, 1] - a[i, 0]) / 2.0) ** order
    for j in range(m):
        cost[n + j, j] = ((b[j, 1] - b[j, 0]) / 2.0) ** order
    rows, cols = linear_sum_assignment(cost)
    total = float(cost[rows, cols].sum()) + inf_cost
    return total ** (1.0 / order) if order != 1.0 else total

"""H0 persistence entirely on TPU: Boruvka MST over a dense distance matrix.

For Vietoris-Rips, the H0 diagram is exactly {(0, w) : w in MST edge
weights} plus one essential (0, inf) bar per connected component — so
H0 at the 10k-point scale never leaves the device: Boruvka runs
ceil(log2 n) rounds of masked row-min + segment-min reductions (pure
VPU work on the distance matrix already in HBM), no edge sort, no
host union-find.

Correctness notes: with distinct weights, mutual component proposals
are the same edge (a component's cheapest outgoing edge to a partner is
also the cheapest edge between the pair), so 2-cycle contraction drops
exactly the duplicate; with ties, either choice yields an MST with the
same weight multiset — and the H0 diagram depends only on weights.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=())
def _boruvka(dist: jnp.ndarray, thresh: jnp.ndarray) -> jnp.ndarray:
    n = dist.shape[0]
    rounds = max(int(np.ceil(np.log2(max(n, 2)))), 1)
    big = jnp.float32(np.inf)
    vidx = jnp.arange(n)

    d = jnp.where(jnp.eye(n, dtype=bool), big, dist.astype(jnp.float32))
    d = jnp.where(d <= thresh, d, big)

    def round_step(state, _):
        comp, weights, count = state

        # each vertex's cheapest edge leaving its component
        dm = jnp.where(comp[:, None] == comp[None, :], big, d)
        row_min = jnp.min(dm, axis=1)
        row_arg = jnp.argmin(dm, axis=1)

        # per-component minimum and its proposing vertex
        comp_min = jax.ops.segment_min(row_min, comp, num_segments=n)   # [n] slots
        is_min = jnp.isfinite(row_min) & (row_min == comp_min[comp])
        cand = jnp.where(is_min, vidx, n)
        u_star = jax.ops.segment_min(cand, comp, num_segments=n)        # [n] slots
        has_edge = u_star < n
        u = jnp.minimum(u_star, n - 1)
        partner = jnp.where(has_edge, comp[row_arg[u]], vidx)           # target comp

        # contract the proposal forest; break 2-cycles at the smaller label
        parent = jnp.where(has_edge, partner, vidx)
        two_cycle = (parent[parent] == vidx) & (vidx < parent)
        parent = jnp.where(two_cycle, vidx, parent)

        # accepted edges: one per non-root component with a proposal
        accept = has_edge & (parent != vidx)
        w = jnp.where(accept, comp_min, big)

        # append accepted weights into the fixed buffer (extra trash slot)
        pos_in_round = jnp.cumsum(accept.astype(jnp.int32)) - 1
        pos = jnp.where(accept, count + pos_in_round, weights.shape[0] - 1)
        weights = weights.at[pos].min(w)
        count = count + jnp.sum(accept)

        # pointer-jump to roots, relabel vertex components
        def jump(p, _):
            return p[p], None
        root, _ = jax.lax.scan(jump, parent, None, length=rounds + 1)
        comp = root[comp]
        return (comp, weights, count), None

    comp0 = vidx
    weights0 = jnp.full((n,), big, jnp.float32)  # n-1 edges + 1 trash slot
    (_, weights, _), _ = jax.lax.scan(
        round_step, (comp0, weights0, jnp.int32(0)), None, length=rounds)
    return jnp.sort(weights[:-1] if n > 1 else weights)[: max(n - 1, 1)]


def boruvka_mst_weights(dist, thresh: float = np.inf) -> np.ndarray:
    """[n-1] MST edge weights ascending; +inf entries mark missing edges
    (disconnected components under the threshold)."""
    n = np.asarray(dist).shape[0]
    if n <= 1:
        return np.zeros((0,), np.float32)
    w = _boruvka(jnp.asarray(dist), jnp.float32(thresh))
    return np.asarray(w)


def h0_diagram_tpu(dist, thresh: float = np.inf) -> np.ndarray:
    """ripser-compatible dgm0: finite (0, w) bars for positive MST
    weights + one (0, inf) bar per connected component."""
    w = boruvka_mst_weights(dist, thresh)
    finite = w[np.isfinite(w)]
    finite = finite[finite > 0]
    n_components = 1 + int(np.sum(~np.isfinite(w)))
    bars = [[0.0, float(x)] for x in finite] + [[0.0, np.inf]] * n_components
    return np.asarray(bars, dtype=np.float64).reshape(-1, 2)

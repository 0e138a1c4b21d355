"""SGD embedding layout as a lax.scan (dense small-n path).

Reproduces umap-learn's ``optimize_layout_euclidean`` semantics —
per-edge sampling schedules (epochs_per_sample), attractive gradients
-2ab d^(2b-2) / (1 + a d^2b), negative sampling with repulsive
gradients 2 gamma b / ((0.001 + d^2)(1 + a d^2b)), per-dimension clip
to [-4, 4], alpha decaying linearly to 0 — but **epoch-synchronous**:
each epoch computes all active gradients against the epoch-start
embedding and applies one fused update, instead of Numba's sequential
in-place races.  Deterministic, fully parallel on TPU, and vmappable
over a leading batch-of-clouds axis.

The fuzzy graph is consumed densely as [n_head, n_tail]: the edge set
and sampling schedules are fixed-shape masked tensors, so 32 layers'
layouts compile to a single XLA program.

Deviation notes (documented, downstream-invariant — SURVEY §7 #2):
  * synchronous updates with a mean-force stabilizer (see above);
  * negative sampling is applied in EXACT EXPECTATION (mean-field):
    umap draws each active edge's owed negatives uniformly from the
    tail set; at dense scale the expectation of those draws is a
    closed-form sum over ALL tails, so the repulsion is computed
    against every tail and weighted by the owed count — identical
    expectation, zero variance, and it removes the [nh, nt, slots]
    random row-gathers that dominated the epoch on TPU (each row
    gather from a narrow [n, 3] table moves a full (8, 128) tile).
    Unlike the old sampled scheme the owed counts are NOT capped,
    matching umap-learn's unbounded per-edge counts.

umap quirks kept faithfully (in expectation): a negative draw equal to
the HEAD vertex itself at zero distance is skipped (umap-learn's
``elif j == k: continue`` compares the draw against ``j = head[i]``);
any other zero-distance draw — including a coincident edge tail —
applies the constant +4-per-dimension kick; edges below
max_weight/n_epochs are pruned before scheduling; schedules start at
epochs_per_sample.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def make_epochs_per_sample(weights: jnp.ndarray, n_epochs: int) -> jnp.ndarray:
    """umap's make_epochs_per_sample on a dense weight matrix; inf = never."""
    wmax = jnp.max(weights)
    n_samples = n_epochs * (weights / jnp.maximum(wmax, 1e-30))
    return jnp.where(n_samples > 0, n_epochs / jnp.maximum(n_samples, 1e-30), jnp.inf)


def _epoch_forces(head, tail, graph_active, n_neg, a, b, gamma):
    """Returns (head_force, head_count, tail_force, tail_count) for one epoch.

    head/tail: epoch-start embeddings.  graph_active [nh, nt] bool.
    n_neg [nh, nt] f32: per-edge owed negative-draw counts (0 where
    inactive).  Forces are summed per point; counts are the number of
    contributing micro-updates, used by the caller to take the MEAN
    force — the stabilizer that replaces Numba's sequential
    self-correcting micro-steps with one bounded synchronous step per
    epoch.

    Repulsion is umap's negative sampling in exact expectation: each
    owed draw is uniform over the nt tails, skipped only when it lands
    on the HEAD vertex itself at zero distance (umap-learn's
    ``elif j == k: continue`` with j the head), with the +4 kick on any
    other zero-distance draw.  E[force_i] = (M_i * S_i - 4 * Z_i) / nt
    where S_i sums the per-pair repulsive gradients (kicks included)
    over all tails, M_i = sum_j n_neg[i, j], and
    Z_i = M_i * [d2(i, i) = 0, i < nt] removes the skipped self-draw
    kick (in fit mode the diagonal is exactly zero, so the self-draw is
    always skipped; in transform mode head i and tail i are different
    points and the skip only fires if they coincide — umap compares the
    raw indices there too); the expected on-count is M_i - Z_i / nt.
    Everything reuses the attraction's diff/d2 — no gathers, no RNG.
    """
    nt = tail.shape[0]
    # --- shared pairwise geometry ---
    diff = head[:, None, :] - tail[None, :, :]                   # [nh, nt, d]
    d2 = jnp.sum(diff * diff, axis=-1)
    pd2b = jnp.power(jnp.maximum(d2, 1e-12), b)

    # --- attractive ---
    att_coeff = jnp.where(d2 > 0.0,
                          (-2.0 * a * b * pd2b / jnp.maximum(d2, 1e-12))
                          / (a * pd2b + 1.0),
                          0.0)
    att_grad = jnp.clip(att_coeff[:, :, None] * diff, -4.0, 4.0)
    att_grad = jnp.where(graph_active[:, :, None], att_grad, 0.0)
    head_force = jnp.sum(att_grad, axis=1)                       # [nh, d]
    tail_force = -jnp.sum(att_grad, axis=0)                      # [nt, d]
    head_count = jnp.sum(graph_active, axis=1).astype(head.dtype)
    tail_count = jnp.sum(graph_active, axis=0).astype(head.dtype)

    # --- repulsive, in expectation over uniform tail draws ---
    rep_coeff = (2.0 * gamma * b) / ((0.001 + d2) * (a * pd2b + 1.0))
    rep_grad = jnp.clip(rep_coeff[:, :, None] * diff, -4.0, 4.0)
    zero_d = d2 <= 0.0
    rep_grad = jnp.where(zero_d[:, :, None], 4.0, rep_grad)      # +4 kick
    s_i = jnp.sum(rep_grad, axis=1)                              # [nh, d]
    m_i = jnp.sum(n_neg, axis=1)                                 # [nh]
    idx = jnp.arange(head.shape[0])
    self_zero = jnp.where(idx < nt, zero_d[idx, jnp.minimum(idx, nt - 1)],
                          False).astype(head.dtype)              # [nh]
    z_i = m_i * self_zero
    head_force = head_force + (m_i[:, None] * s_i - 4.0 * z_i[:, None]) / nt
    head_count = head_count + m_i - z_i / nt
    return head_force, head_count, tail_force, tail_count


@functools.partial(jax.jit, static_argnames=("n_epochs", "negative_sample_rate", "move_other"))
def optimize_layout(head_embedding: jnp.ndarray,
                    tail_embedding: jnp.ndarray,
                    graph: jnp.ndarray,
                    n_epochs: int,
                    key: jax.Array,
                    a: float, b: float,
                    gamma: float = 1.0,
                    initial_alpha: float = 1.0,
                    negative_sample_rate: int = 5,
                    move_other: bool = True) -> jnp.ndarray:
    """Optimize head_embedding against tail_embedding.

    graph[i, j] > 0 is a directed edge pulling head i toward tail j.
    move_other=True is fit mode: head and tail are the SAME embedding
    (pass identical arrays); attractive recoil on tails folds into the
    single evolving state.  move_other=False is transform mode: tails
    stay fixed at ``tail_embedding``.

    ``key`` is kept for API stability; the mean-field repulsion is
    deterministic (see module docstring), so it is unused.
    """
    del key  # deterministic mean-field repulsion
    n_head, dim = head_embedding.shape
    a32, b32, g32 = jnp.float32(a), jnp.float32(b), jnp.float32(gamma)

    wmax = jnp.max(graph)
    graph = jnp.where(graph < wmax / n_epochs, 0.0, graph)
    eps_mat = make_epochs_per_sample(graph, n_epochs)            # [nh, nt]
    epns_mat = eps_mat / negative_sample_rate
    edge_mask = jnp.isfinite(eps_mat)

    def epoch_step(state, epoch):
        emb, eons, eonns = state
        head = emb
        tail = emb if move_other else tail_embedding.astype(jnp.float32)
        alpha = initial_alpha * (1.0 - epoch.astype(jnp.float32) / n_epochs)

        active = edge_mask & (eons <= epoch)
        n_neg = jnp.where(active, (epoch.astype(jnp.float32) - eonns) / epns_mat, 0.0)
        n_neg_int = jnp.floor(n_neg).astype(jnp.int32)
        n_neg_f = n_neg_int.astype(jnp.float32)

        head_force, head_count, tail_force, tail_count = _epoch_forces(
            head, tail, active, n_neg_f, a32, b32, g32)

        if move_other:
            count = jnp.maximum(head_count + tail_count, 1.0)
            emb = emb + (head_force + tail_force) / count[:, None] * alpha
        else:
            emb = emb + head_force / jnp.maximum(head_count, 1.0)[:, None] * alpha

        eons = jnp.where(active, eons + eps_mat, eons)
        eonns = jnp.where(active, eonns + n_neg_f * epns_mat, eonns)
        return (emb, eons, eonns), None

    eons0 = jnp.where(edge_mask, eps_mat, jnp.inf)
    eonns0 = jnp.where(edge_mask, epns_mat, jnp.inf)
    state0 = (head_embedding.astype(jnp.float32), eons0, eonns0)
    # measured on-chip: unrolling this scan (2x/4x) is a consistent
    # LOSS at headline scale — the bigger unrolled body inflates
    # per-step live tensors without removing the sequential dependence
    # between epochs
    (emb, _, _), _ = jax.lax.scan(epoch_step, state0,
                                  jnp.arange(n_epochs, dtype=jnp.int32))
    return emb

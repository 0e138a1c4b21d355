"""Silhouette score in JAX.

Behavioral contract: sklearn.metrics.silhouette_score as used by the
reference (debug_tda_pipeline.py:117-118, analyze_adversarial_tda.py:
108-111) — mean silhouette over samples, Euclidean metric, arbitrary
(string) labels.  Fixed-shape, jit-able, vmappable over a leading
clouds axis so all 32 layers x 4 label-sets score in one program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("n_classes",))
def silhouette_jax(x: jnp.ndarray, labels: jnp.ndarray, n_classes: int) -> jnp.ndarray:
    """x [n, d] float, labels [n] int in [0, n_classes). Returns scalar."""
    n = x.shape[0]
    diff = x[:, None, :] - x[None, :, :]
    dist = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 0.0))

    onehot = jax.nn.one_hot(labels, n_classes, dtype=x.dtype)       # [n, C]
    counts = jnp.sum(onehot, axis=0)                                # [C]
    # HIGHEST precision: TPU MXU matmuls default to bf16 multiplies,
    # which breaks the 1e-5 sklearn-parity bar (tiny matrices; free)
    sums = jnp.dot(dist, onehot, precision=jax.lax.Precision.HIGHEST)

    own_count = counts[labels]                                      # [n]
    own_sum = jnp.take_along_axis(sums, labels[:, None], axis=1)[:, 0]
    # a(i): mean intra-cluster distance excluding self
    a = jnp.where(own_count > 1, own_sum / jnp.maximum(own_count - 1, 1), 0.0)

    # b(i): min over other clusters of mean distance
    mean_other = sums / jnp.maximum(counts[None, :], 1)
    is_own = jax.nn.one_hot(labels, n_classes, dtype=bool)
    mean_other = jnp.where(is_own | (counts[None, :] == 0), jnp.inf, mean_other)
    b = jnp.min(mean_other, axis=1)

    s = jnp.where(own_count > 1, (b - a) / jnp.maximum(jnp.maximum(a, b), 1e-30), 0.0)
    return jnp.mean(s)


def silhouette_score(x, labels) -> float:
    """sklearn-compatible entry: accepts string/object labels."""
    x = jnp.asarray(np.asarray(x, dtype=np.float32))
    lab = np.asarray(labels)
    uniq, enc = np.unique(lab, return_inverse=True)
    if len(uniq) < 2 or len(uniq) >= len(lab):
        raise ValueError("silhouette requires 2 <= n_labels <= n_samples - 1")
    return float(silhouette_jax(x, jnp.asarray(enc), int(len(uniq))))

"""Spectral initialization of the embedding.

umap-learn initializes from the bottom eigenvectors of the symmetric
normalized Laplacian of the fuzzy graph, rescaled to max-abs 10 with
tiny Gaussian jitter.  At tdax's cloud sizes a dense ``jnp.linalg.eigh``
is both exact and TPU-friendly (and vmaps over the layer axis), so no
sparse Lanczos machinery is needed.  Disconnected graphs are handled
naturally: the Laplacian's null space is spanned by component
indicators, so the bottom non-trivial eigenvectors separate components
(approximating umap-learn's component_layout meta-embedding).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("n_components",))
def spectral_init(w: jnp.ndarray, n_components: int,
                  key: jax.Array) -> jnp.ndarray:
    """[n, n_components] spectral layout, scaled to max-abs 10 + jitter."""
    n = w.shape[0]
    deg = jnp.sum(w, axis=1)
    inv_sqrt = jnp.where(deg > 0, 1.0 / jnp.sqrt(jnp.maximum(deg, 1e-12)), 0.0)
    lap = jnp.eye(n, dtype=w.dtype) - inv_sqrt[:, None] * w * inv_sqrt[None, :]
    # eigh returns ascending eigenvalues; skip the trivial 0-eigenvector
    _, vecs = jnp.linalg.eigh(lap)
    emb = vecs[:, 1:n_components + 1]
    expansion = 10.0 / jnp.maximum(jnp.max(jnp.abs(emb)), 1e-12)
    emb = emb * expansion
    noise = jax.random.normal(key, emb.shape, dtype=emb.dtype) * 1e-4
    return (emb + noise).astype(jnp.float32)

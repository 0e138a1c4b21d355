"""JAX ports of the reference's dormant geometry-metrics library.

Behavioral contract: ``metrics.py`` in the reference (SURVEY §2.1, L5)
— six batched kernels, TorchScript there, pure JAX here.  Semantics are
matched including the edge-case conventions (window truncation, NaN
returns, TwoNN outlier discard against n_samples, unbiased variance
guards, the (0, 1000) slope sanity bound).  Citations per function.

All array kernels are jit-able and batched; ``compute_accuracy_by_example``
is host-side (regex over string token labels), as in the reference.
"""

from __future__ import annotations

import functools
import re

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def compute_effective_dimensionality(activations_batch: jnp.ndarray) -> jnp.ndarray:
    """Normalized participation ratio of singular values
    (reference metrics.py:5-44): [(sum s)^2 / sum s^2] / min(N, D).

    activations_batch: [batch, n_samples, embed_dim] -> [batch]."""
    x = activations_batch.astype(jnp.float32)
    s = jnp.linalg.svd(x, compute_uv=False)
    sum_s = jnp.sum(s, axis=1)
    sum_s2 = jnp.maximum(jnp.sum(s * s, axis=1), 1e-10)
    pr = (sum_s * sum_s) / sum_s2
    min_dim = float(min(x.shape[1], x.shape[2]))
    return pr / max(min_dim, 1.0)


def compute_fixed_window_ed(activations_batch: jnp.ndarray, n_windows: int) -> jnp.ndarray:
    """ED over fixed non-overlapping windows (reference metrics.py:47-109).

    [batch, seq, dim] -> [batch, n_windows].  Truncates the sequence to
    a multiple of n_windows; n_windows > seq_len degrades to per-token
    windows; window_size 0 repeats the full-sequence ED."""
    if n_windows <= 0:
        raise ValueError("n_windows must be positive")
    batch, seq_len, dim = activations_batch.shape
    n_windows = min(n_windows, seq_len)
    window_size = seq_len // n_windows
    truncated = n_windows * window_size
    if truncated == 0:
        full = compute_effective_dimensionality(activations_batch)
        return jnp.broadcast_to(full[:, None], (batch, n_windows))
    windows = activations_batch[:, :truncated, :].reshape(batch, n_windows, window_size, dim)
    flat = jnp.transpose(windows, (1, 0, 2, 3)).reshape(n_windows * batch, window_size, dim)
    ed = compute_effective_dimensionality(flat)
    return jnp.transpose(ed.reshape(n_windows, batch), (1, 0))


@functools.partial(jax.jit, static_argnames=("discard_fraction",))
def compute_intrinsic_dimensionality(data: jnp.ndarray,
                                     discard_fraction: float = 0.1,
                                     eps: float = 1e-10) -> jnp.ndarray:
    """TwoNN intrinsic dimensionality (reference metrics.py:112-208):
    mu = r2/r1 ratios, discard top fraction, zero-intercept regression of
    -log(1 - F_emp) on log(mu).  [batch, n, d] -> [batch] (NaN on failure)."""
    batch, n, _ = data.shape
    if n <= 5:
        return jnp.full((batch,), jnp.nan, dtype=jnp.float32)
    x = data.astype(jnp.float32)

    diff = x[:, :, None, :] - x[:, None, :, :]
    dist = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 0.0))
    dist = dist + jnp.eye(n, dtype=x.dtype)[None] * jnp.inf

    neg2, _ = jax.lax.top_k(-dist, 2)
    r1, r2 = -neg2[..., 0], -neg2[..., 1]
    valid = (r1 > eps) & (r2 > eps)
    mu = jnp.where(valid, r2 / jnp.maximum(r1, eps), jnp.inf)

    mu_sorted = jnp.sort(mu, axis=1)                      # inf (invalid) last
    n_valid = jnp.sum(jnp.isfinite(mu_sorted), axis=1)    # [batch]
    n_keep = jnp.maximum((n_valid * (1.0 - discard_fraction)).astype(jnp.int32), 5)

    slot = jnp.arange(n)[None, :]
    keep = slot < n_keep[:, None]
    f_emp = (slot + 1.0) / float(n)
    safe_mu = jnp.where(keep, mu_sorted, 1.0)
    xr = jnp.log(safe_mu + eps)
    yr = -jnp.log(1.0 - f_emp + eps)
    xr = jnp.where(keep, xr, 0.0)
    yr = jnp.where(keep, yr, 0.0)

    k = jnp.maximum(n_keep.astype(jnp.float32), 1.0)
    mean_x = jnp.sum(xr, axis=1) / k
    mean_y = jnp.sum(yr, axis=1) / k
    var_x = jnp.sum(jnp.where(keep, (xr - mean_x[:, None]) ** 2, 0.0), axis=1) / jnp.maximum(k - 1, 1.0)
    var_y = jnp.sum(jnp.where(keep, (yr - mean_y[:, None]) ** 2, 0.0), axis=1) / jnp.maximum(k - 1, 1.0)

    num = jnp.sum(xr * yr, axis=1)
    den = jnp.sum(xr * xr, axis=1)
    slope = num / jnp.where(jnp.abs(den) < eps, 1.0, den)

    ok = ((n_valid >= 5) & (var_x >= eps) & (var_y >= eps)
          & (jnp.abs(den) >= eps) & jnp.isfinite(slope)
          & (slope > 0.0) & (slope < 1000.0))
    return jnp.where(ok, slope, jnp.nan)


def compute_fixed_window_id(activations_batch: jnp.ndarray, n_windows: int,
                            discard_fraction: float = 0.1) -> jnp.ndarray:
    """Windowed TwoNN (reference metrics.py:211-265): NaN when windows are
    too small (min 6 samples per window)."""
    batch, seq_len, dim = activations_batch.shape
    nan = jnp.full((batch, max(n_windows, 1)), jnp.nan, dtype=jnp.float32)
    if n_windows <= 0 or seq_len < n_windows or seq_len < 6:
        return nan
    window_size = seq_len // n_windows
    if window_size < 6:
        return nan
    truncated = n_windows * window_size
    windows = activations_batch[:, :truncated, :].reshape(batch, n_windows, window_size, dim)
    flat = jnp.transpose(windows, (1, 0, 2, 3)).reshape(n_windows * batch, window_size, dim)
    ids = compute_intrinsic_dimensionality(flat, discard_fraction)
    return jnp.transpose(ids.reshape(n_windows, batch), (1, 0))


def compute_accuracy_by_example(gt_ids: np.ndarray, pred_ids: np.ndarray,
                                token_labels: np.ndarray,
                                accuracy_mode: str = "all") -> np.ndarray:
    """Per-example token accuracy keyed by 'ex<N>_answer' labels
    (reference metrics.py:268-342).  Host-side numpy."""
    gt = np.asarray(gt_ids)
    pred = np.asarray(pred_ids)
    batch_size = gt.shape[0]

    all_labels_str = " ".join(map(str, np.asarray(token_labels).flatten()))
    all_ints = [int(d) for d in re.findall(r"\d+", all_labels_str)]
    max_example_idx = max(all_ints) if all_ints else 0
    if max_example_idx == 0:
        return np.empty((batch_size, 0), dtype=np.float32)

    acc = np.full((batch_size, max_example_idx), np.nan, dtype=np.float32)
    for b in range(batch_size):
        labels = token_labels[b]
        for ex in range(1, max_example_idx + 1):
            mask = np.array([str(l) == f"ex{ex}_answer" for l in labels])
            if not mask.any():
                continue
            g, p = gt[b][mask], pred[b][mask]
            if g.size == 0:
                continue
            if accuracy_mode == "all":
                acc[b, ex - 1] = float(np.all(g == p))
            elif accuracy_mode == "first_token":
                acc[b, ex - 1] = float(g[0] == p[0])
            elif accuracy_mode == "token_wise":
                acc[b, ex - 1] = float(np.mean(g == p))
            else:
                raise ValueError(f"Invalid accuracy_mode: {accuracy_mode}")
    return acc


@functools.partial(jax.jit, static_argnames=("alpha",))
def matrix_entropy(matrix: jnp.ndarray, alpha: float = 1.0,
                   eps: float = 1e-10) -> jnp.ndarray:
    """Matrix-based Renyi/Shannon entropy of the Gram spectrum
    (reference metrics.py:344-398).  [..., N, D] -> [...]."""
    z = matrix.astype(jnp.float32)
    k = jnp.matmul(z, jnp.swapaxes(z, -2, -1))
    ev = jnp.linalg.eigvalsh(k)
    ev = jnp.maximum(ev, 0.0)
    trace = jnp.sum(ev, axis=-1) + eps
    p = ev / trace[..., None]
    if abs(alpha - 1.0) < eps:
        return -jnp.sum(jax.scipy.special.xlogy(p, p), axis=-1)
    p_alpha = jnp.power(p, alpha)
    return jnp.log(jnp.sum(p_alpha, axis=-1)) / (1.0 - alpha)

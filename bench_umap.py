#!/usr/bin/env python
"""UMAP scale benchmark: n-point cosine UMAP 4096-d -> 3-d on device.

The reference's umap-learn handles 10k-100k-point clouds routinely
(Numba kernels on CPU); this measures tdax's edge-list path
(tdax/ops/umap/sparse_path.py) at the same scale on one TPU chip:
exact blocked kNN on the MXU, sigma/rho + membership on [n, k] lists,
host COO symmetrization, spectral init (LOBPCG on the normalized
Laplacian — umap-learn's default semantics), epoch-scan SGD layout.

Usage: python bench_umap.py [n_points] [n_neighbors]
Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is against a 60 s target for the 10k configuration
(umap-learn on a workstation CPU takes roughly that on 10k x 4096
cosine; the reference publishes no numbers — SURVEY.md §6).
"""

import json
import sys
import time

import numpy as np

TARGET_SECONDS = 60.0


def make_cloud(n: int, d: int = 4096, seed: int = 42,
               return_labels: bool = False):
    """Gaussian-mixture manifold: 8 clusters on a random 16-d subspace,
    embedded in d dims — enough structure that the layout has work to do."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(8, 16)) * 4.0
    labels = rng.integers(0, 8, n)
    z = centers[labels] + rng.normal(size=(n, 16))
    proj = rng.normal(size=(16, d)) / 4.0
    x = (z @ proj).astype(np.float32)
    return (x, labels) if return_labels else x


def main() -> None:
    from tdax.utils import setup_runtime

    setup_runtime(want_device=True)
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    x, labels = make_cloud(n, return_labels=True)

    from tdax.ops.umap import UMAP

    # cold (compile included)
    t0 = time.time()
    emb = UMAP(n_neighbors=k, n_components=3, metric="cosine",
               random_state=42).fit_transform(x)
    cold = time.time() - t0
    assert emb.shape == (n, 3) and np.all(np.isfinite(emb))

    # structure gate: the 8 planted clusters must stay separated in the
    # embedding (this runs on the chip every round — the bench doubles
    # as an at-scale structure test for the edge-list path)
    from tdax.metrics.silhouette import silhouette_score
    sub = np.random.default_rng(0).choice(n, min(n, 4000), replace=False)
    sil = float(silhouette_score(emb[sub], labels[sub]))
    assert sil > 0.6, f"planted clusters collapsed: silhouette={sil:.3f}"
    print(json.dumps({"stage": f"umap_{n}pts_structure",
                      "silhouette_8clusters": round(sil, 3)}))

    # warm, host-resident input (includes the host->device upload)
    t0 = time.time()
    emb = UMAP(n_neighbors=k, n_components=3, metric="cosine",
               random_state=42).fit_transform(x)
    warm = time.time() - t0

    from tdax.ops.umap.sparse_path import LAST_TIMINGS
    warm_timings = {kk: round(v, 2) for kk, v in LAST_TIMINGS.items()}

    # warm, HBM-resident input (the product path: activation clouds come
    # straight out of model capture and never visit the host)
    import jax
    x_dev = jax.device_put(x)
    x_dev.block_until_ready()
    t0 = time.time()
    emb = UMAP(n_neighbors=k, n_components=3, metric="cosine",
               random_state=42).fit_transform(x_dev)
    warm_dev = time.time() - t0

    print(json.dumps({"stage": f"umap_{n}pts_4096d_cosine_k{k}",
                      "cold_s": round(cold, 2), "warm_s": round(warm, 2),
                      "warm_hbm_s": round(warm_dev, 2),
                      "warm_timings": warm_timings}))
    print(json.dumps({"metric": f"umap_scale_{n}pts_4096d_to3d",
                      "value": round(warm, 2), "unit": "s",
                      "vs_baseline": round(TARGET_SECONDS / warm, 1)}))
    print(json.dumps({"metric": f"umap_scale_{n}pts_4096d_to3d_hbm",
                      "value": round(warm_dev, 2), "unit": "s",
                      "vs_baseline": round(TARGET_SECONDS / warm_dev, 1)}))


if __name__ == "__main__":
    main()

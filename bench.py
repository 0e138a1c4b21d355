#!/usr/bin/env python
"""tdax headline benchmark.

Metric: wall-clock of the full per-layer TDA sweep — 32 layers x (UMAP
4096-d -> 3-d + Vietoris-Rips H0/H1 + 2 silhouettes) on the 6x6
dataset's 36-point clouds — the reference pipeline's hot path
(debug_tda_pipeline.py:92-150) against BASELINE.json's <60 s v5e-8
target.  Warm timing (compile excluded; the persistent cache makes
real reruns warm too).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

BASELINE_SECONDS = 60.0  # BASELINE.json north-star target
N_LAYERS, N_SAMPLES, HIDDEN = 32, 36, 4096


def make_clouds(seed: int = 42) -> tuple[np.ndarray, list[str], list[str]]:
    """Synthetic activation clouds shaped like the real workload
    (32 x 36 x 4096), with shape-clustered structure at one layer."""
    rng = np.random.default_rng(seed)
    shapes = [f"s{i}" for i in range(6)]
    colors = [f"c{i}" for i in range(6)]
    shape_labels = [shapes[i // 6] for i in range(N_SAMPLES)]
    color_labels = [colors[i % 6] for i in range(N_SAMPLES)]
    clouds = rng.normal(size=(N_LAYERS, N_SAMPLES, HIDDEN))
    centers = rng.normal(size=(6, HIDDEN)) * 3
    for j in range(N_SAMPLES):
        clouds[25, j] = centers[j // 6] + rng.normal(0, 0.5, HIDDEN)
    return clouds, shape_labels, color_labels


def run_sweep(clouds, shape_labels, color_labels):
    from tdax.config import SweepConfig
    from tdax.pipeline.tda_sweep import (batched_silhouettes, embed_layers,
                                         persistence_per_layer)

    cfg = SweepConfig()
    clouds_3d = embed_layers(clouds, cfg).astype(np.float32)
    sil = batched_silhouettes(clouds_3d, {"shape": shape_labels,
                                          "color": color_labels})
    dgms = persistence_per_layer(clouds_3d, maxdim=1)
    return clouds_3d, sil, dgms


def main() -> None:
    from tdax.utils import setup_runtime

    setup_runtime(want_device=True)
    clouds, shape_labels, color_labels = make_clouds()

    run_sweep(clouds, shape_labels, color_labels)  # warm-up / compile
    t0 = time.time()
    _, sil, dgms = run_sweep(clouds, shape_labels, color_labels)
    elapsed = time.time() - t0

    assert int(np.argmax(sil["shape"])) == 25, "sanity: planted peak layer"
    assert all(len(d) == 2 for d in dgms)

    print(json.dumps({
        "metric": "umap_ph_sweep_32layers_36x4096",
        "value": round(elapsed, 3),
        "unit": "s",
        "vs_baseline": round(BASELINE_SECONDS / elapsed, 2),
    }))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Per-layer UMAP + persistent-homology sweep (main pipeline).

Drop-in entry point matching reference ``debug_tda_pipeline.py``: reads
``data/physics_experiment_6x6/all_activations.pt`` (or ``.npz``),
writes ``tda_debug_output/{summary_stats.json, diagrams/,
point_clouds_3d/, summary_evolution_plot.png}``, prints per-layer stats
and the peak shape-silhouette layer.  On TPU, all 32 layers embed and
score in one compiled program.
"""

import os

from tdax.config import DatasetConfig, SweepConfig
from tdax.data.io import load_activations
from tdax.pipeline import run_tda_sweep
from tdax.utils import setup_runtime


def main() -> None:
    setup_runtime()
    ds = DatasetConfig()
    cfg = SweepConfig()
    # prefer the native columnar .npz (no torch import, ~30s faster load);
    # fall back to the reference's .pt contract
    path = ds.activations_path
    npz = path.replace(".pt", ".npz")
    if os.path.exists(npz):
        path = npz
    print(f"Debug output will be saved to: {cfg.output_dir}")
    print(f"Loading activations from {path}...")
    all_data = load_activations(path)
    run_tda_sweep(all_data, ds.metadata_path, cfg)


if __name__ == "__main__":
    main()

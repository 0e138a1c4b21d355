#!/usr/bin/env python
"""Legacy per-layer TDA sweep with a SHARED UMAP reducer.

Drop-in entry point matching reference ``analyze_tda_over_layers.py``:
one reducer fit on the LAST layer's cloud then ``transform()`` applied
to every layer (same "camera", reference :65-72), peak layer by max H1
persistence (:126), 1x3 evolution plot.  The reference pointed at the
defunct ``data/physics_experiment`` dir (:13); this entry point uses
the 6x6 dataset, with the n_neighbors = max(2, n//2) heuristic (:39).
"""

import os

import numpy as np

from tdax.config import DatasetConfig, SweepConfig, UMAPConfig
from tdax.data.io import load_activations
from tdax.pipeline import run_tda_sweep
from tdax.viz.diagrams import plot_diagrams
from tdax.viz.evolution import plot_evolution_1x3
from tdax.utils import setup_runtime

POINT_CLOUD_TYPE = "bound"


def main() -> None:
    setup_runtime()
    ds = DatasetConfig()
    path = ds.activations_path
    if not os.path.exists(path) and os.path.exists(path.replace(".pt", ".npz")):
        path = path.replace(".pt", ".npz")
    print(f"Loading activations from {path}...")
    all_data = load_activations(path)

    n_samples = sum(1 for d in all_data.values()
                    if d["metadata"]["type"] == POINT_CLOUD_TYPE)
    cfg = SweepConfig(
        point_cloud_type=POINT_CLOUD_TYPE,
        output_dir="tda_legacy_output",
        umap=UMAPConfig(n_neighbors=max(2, n_samples // 2)),
        reducer_mode="shared",
        peak_rule="max_h1",
        save_diagrams=False,
    )
    result = run_tda_sweep(all_data, ds.metadata_path, cfg)

    plot_evolution_1x3(result["stats"], f"tda_evolution_{POINT_CLOUD_TYPE}_umap.png",
                       POINT_CLOUD_TYPE)
    print(f"Saved plot to tda_evolution_{POINT_CLOUD_TYPE}_umap.png")

    peak = result["peak_layer"]
    print(f"Peak $H_1$ persistence is at layer: {peak}")
    import matplotlib
    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt
    plt.figure()
    plot_diagrams(result["diagrams"][peak],
                  title=f"Persistence Diagram at Peak Layer {peak} (UMAP-3D)")
    plt.savefig(f"peak_layer_{peak}_diagram_umap.png")
    print(f"Saved diagram for peak layer {peak}")


if __name__ == "__main__":
    main()

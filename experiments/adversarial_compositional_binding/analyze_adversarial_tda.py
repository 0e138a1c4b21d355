#!/usr/bin/env python
"""Adversarial-condition TDA analysis and cross-condition comparison.

Drop-in entry point matching reference
``experiments/adversarial_compositional_binding/analyze_adversarial_tda.py``:
reads ``adversarial_activations.pt`` (or ``.npz``), computes per-condition
per-layer UMAP+PH+silhouettes, writes the
``tda_adversarial_output/{condition}/...`` tree, the 2x3 comparison
figure (including the persistence-disruption metric), and
``summary.json``.
"""

import os
import sys

# _PROJECT_ROOT_BOOTSTRAP: the reference's experiment scripts run
# from any cwd (PROJECT_ROOT from __file__, reference
# generate_adversarial_metadata.py:7-9); mirror that for the tdax
# import itself so the scripts work without pip-installing the repo
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

from tdax.config import DatasetConfig, SweepConfig
from tdax.data.io import load_activations
from tdax.pipeline import run_adversarial_sweep
from tdax.utils import setup_runtime

SCRIPT_DIR = os.path.dirname(os.path.abspath(__file__))
PROJECT_ROOT = os.path.dirname(os.path.dirname(SCRIPT_DIR))


def main() -> None:
    setup_runtime()
    ds = DatasetConfig(data_dir=os.path.join(PROJECT_ROOT, "data/physics_experiment_6x6"))
    output_dir = os.path.join(PROJECT_ROOT, "tda_adversarial_output")

    path = ds.adversarial_activations_path
    if not os.path.exists(path) and os.path.exists(path.replace(".pt", ".npz")):
        path = path.replace(".pt", ".npz")
    print(f"Loading activations from {path}...")
    all_data = load_activations(path)

    from collections import Counter
    counts = Counter(d["metadata"]["condition"] for d in all_data.values())
    print("\nSamples per condition:")
    for cond, cnt in sorted(counts.items()):
        print(f"  {cond}: {cnt} samples")

    run_adversarial_sweep(all_data, output_dir, SweepConfig())


if __name__ == "__main__":
    main()

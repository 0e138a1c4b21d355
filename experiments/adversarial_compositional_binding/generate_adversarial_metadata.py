#!/usr/bin/env python
"""Generate adversarial image-text pairs for the compositional-binding experiment.

Drop-in entry point matching reference
``experiments/adversarial_compositional_binding/generate_adversarial_metadata.py``:
reads the base ``metadata.json``, writes ``adversarial_metadata.json``
(720 samples, 4 conditions), and prints per-condition counts.
Path-independent via PROJECT_ROOT from __file__ (reference :7-9).
"""

import os
import sys

# _PROJECT_ROOT_BOOTSTRAP: the reference's experiment scripts run
# from any cwd (PROJECT_ROOT from __file__, reference
# generate_adversarial_metadata.py:7-9); mirror that for the tdax
# import itself so the scripts work without pip-installing the repo
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

from tdax.config import DatasetConfig
from tdax.data import load_metadata
from tdax.data.adversarial import condition_counts, generate_adversarial_metadata

SCRIPT_DIR = os.path.dirname(os.path.abspath(__file__))
PROJECT_ROOT = os.path.dirname(os.path.dirname(SCRIPT_DIR))


def main() -> None:
    cfg = DatasetConfig(data_dir=os.path.join(PROJECT_ROOT, "data/physics_experiment_6x6"))
    print(f"Loading base metadata from {cfg.metadata_path}...")
    base = load_metadata(cfg.metadata_path)
    samples = generate_adversarial_metadata(base, cfg, save=True)

    print(f"\nGenerated {len(samples)} adversarial samples:")
    for cond, count in sorted(condition_counts(samples).items()):
        print(f"  {cond}: {count} samples")
    print(f"\nSaved to {cfg.adversarial_metadata_path}")


if __name__ == "__main__":
    main()

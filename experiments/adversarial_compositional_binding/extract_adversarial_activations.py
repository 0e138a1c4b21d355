#!/usr/bin/env python
"""Extract activations for the 720 adversarial image-text pairs.

Drop-in entry point matching reference
``experiments/adversarial_compositional_binding/extract_adversarial_activations.py``
including its crash-recovery contract: incremental ``.tmp`` checkpoints
every SAVE_INTERVAL samples, resume-by-sample-id on restart, temp-file
cleanup on success (reference :58-83,150-168) — at batch granularity on
TPU.

``--toy`` runs the tiny random-weights model (no checkpoint required).
"""

import os
import sys

# _PROJECT_ROOT_BOOTSTRAP: the reference's experiment scripts run
# from any cwd (PROJECT_ROOT from __file__, reference
# generate_adversarial_metadata.py:7-9); mirror that for the tdax
# import itself so the scripts work without pip-installing the repo
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

from tdax.config import DatasetConfig, ExtractConfig
from tdax.data.io import load_metadata
from tdax.models.qwen_vl import QwenVLConfig
from tdax.pipeline.extract import extract_activations
from tdax.utils import setup_runtime

SCRIPT_DIR = os.path.dirname(os.path.abspath(__file__))
PROJECT_ROOT = os.path.dirname(os.path.dirname(SCRIPT_DIR))
SAVE_INTERVAL = 50  # reference :58


def main() -> None:
    setup_runtime()
    toy = "--toy" in sys.argv
    ds = DatasetConfig(data_dir=os.path.join(PROJECT_ROOT, "data/physics_experiment_6x6"))
    ecfg = ExtractConfig(model_dir=None if toy else os.path.join(PROJECT_ROOT, "qwen-vl-chat-local"),
                         save_interval=SAVE_INTERVAL,
                         quantize_int8="--int8" in sys.argv)
    cfg = QwenVLConfig.tiny() if toy else QwenVLConfig()

    metadata = load_metadata(ds.adversarial_metadata_path)
    print(f"Processing {len(metadata)} adversarial samples...")
    print(f"Will save incrementally every {SAVE_INTERVAL} samples.")
    results = extract_activations(metadata, ds.adversarial_activations_path,
                                  cfg, ecfg)
    print(f"\nExtracted activations for {len(results)} samples.")


if __name__ == "__main__":
    main()

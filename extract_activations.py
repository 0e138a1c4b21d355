#!/usr/bin/env python
"""Extract per-layer last-text-token activations for every dataset sample.

Drop-in entry point matching reference ``extract_activations.py``:
reads ``data/physics_experiment_6x6/metadata.json``, writes
``all_activations.pt`` with the identical nested-dict schema
(plus a fast ``.npz`` sibling).  The forward runs as ONE jitted batched
TPU program with per-layer capture instead of 48 serial hooked
forwards.

Usage:
  python extract_activations.py           # real Qwen-VL-Chat from ./qwen-vl-chat-local
  python extract_activations.py --toy     # tiny random-weights model (no checkpoint
                                          # needed; smoke/e2e runs)
  python extract_activations.py --int8    # weight-only int8 (full 9.66B model
                                          # on ONE v5e chip)
"""

import sys

from tdax.config import DatasetConfig, ExtractConfig
from tdax.data.io import load_metadata
from tdax.models.qwen_vl import QwenVLConfig
from tdax.pipeline.extract import extract_activations
from tdax.utils import setup_runtime


def main() -> None:
    setup_runtime()
    toy = "--toy" in sys.argv
    ds = DatasetConfig()
    # toy mode must never load a real checkpoint (shape mismatch)
    ecfg = ExtractConfig(model_dir=None if toy else ExtractConfig.model_dir,
                         quantize_int8="--int8" in sys.argv)
    cfg = QwenVLConfig.tiny() if toy else QwenVLConfig()

    print(f"Loading metadata from {ds.metadata_path}...")
    metadata = load_metadata(ds.metadata_path)
    print(f"Extracting activations for {len(metadata)} samples "
          f"({'toy model' if toy else ecfg.model_dir})...")
    results = extract_activations(metadata, ds.activations_path, cfg, ecfg)
    print(f"\nExtracted activations for {len(results)} samples.")


if __name__ == "__main__":
    main()

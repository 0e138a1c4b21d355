#!/usr/bin/env python
"""Generate the 6x6 color x shape dataset (48 images + metadata.json).

Drop-in entry point matching reference ``generate_dataset.py`` —
writes ``data/physics_experiment_6x6/images/*.png`` and
``metadata.json`` with the identical schema and sample order.
"""

from tdax.config import DatasetConfig
from tdax.data import generate_dataset


def main() -> None:
    cfg = DatasetConfig()
    metadata = generate_dataset(cfg)
    print(f"Generated {len(metadata)} samples in {cfg.data_dir}")


if __name__ == "__main__":
    main()

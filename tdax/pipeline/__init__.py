"""Sweep orchestration and artifact IO (reference layer L3)."""

from tdax.pipeline.tda_sweep import run_tda_sweep
from tdax.pipeline.adversarial import run_adversarial_sweep

__all__ = ["run_tda_sweep", "run_adversarial_sweep"]

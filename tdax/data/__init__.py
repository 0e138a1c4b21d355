"""Dataset generation and artifact IO (reference layer L1)."""

from tdax.data.dataset import create_image, generate_dataset
from tdax.data.adversarial import generate_adversarial_metadata
from tdax.data.io import (
    load_activations,
    save_activations,
    load_metadata,
    activations_to_layer_clouds,
)

__all__ = [
    "create_image",
    "generate_dataset",
    "generate_adversarial_metadata",
    "load_activations",
    "save_activations",
    "load_metadata",
    "activations_to_layer_clouds",
]

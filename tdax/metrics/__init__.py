"""Geometry and persistence metrics (reference layers L3/L5)."""

from tdax.metrics.silhouette import silhouette_score
from tdax.metrics.persistence import (get_persistence, bottleneck_distance,
                                      wasserstein_distance, diagram_stats)
from tdax.metrics.geometry import (compute_effective_dimensionality,
                                   compute_fixed_window_ed,
                                   compute_intrinsic_dimensionality,
                                   compute_fixed_window_id,
                                   compute_accuracy_by_example,
                                   matrix_entropy)

__all__ = [
    "silhouette_score", "get_persistence", "bottleneck_distance",
    "wasserstein_distance",
    "diagram_stats",
    "compute_effective_dimensionality", "compute_fixed_window_ed",
    "compute_intrinsic_dimensionality", "compute_fixed_window_id",
    "compute_accuracy_by_example", "matrix_entropy",
]

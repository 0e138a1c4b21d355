"""Root-level geometry-metrics shim, import-compatible with the
reference's dormant library (``/root/reference/metrics.py:5-398``):
``from metrics import compute_effective_dimensionality`` etc. works
exactly as it does against the reference repo.  All implementations are
the JAX ports in tdax.metrics.geometry (unit-tested against the
TorchScript originals in tests/test_metrics.py).
"""

from tdax.metrics.geometry import (  # noqa: F401
    compute_accuracy_by_example,
    compute_effective_dimensionality,
    compute_fixed_window_ed,
    compute_fixed_window_id,
    compute_intrinsic_dimensionality,
    matrix_entropy,
)

__all__ = [
    "compute_effective_dimensionality",
    "compute_fixed_window_ed",
    "compute_intrinsic_dimensionality",
    "compute_fixed_window_id",
    "compute_accuracy_by_example",
    "matrix_entropy",
]

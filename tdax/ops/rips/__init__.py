"""Vietoris-Rips persistent homology.

Re-implements the behavioral contract of the reference's ripser
dependency (SURVEY §2.2): VR persistence on a point cloud or distance
matrix, ``maxdim`` up to 2 (H0/H1/H2), Z/2 coefficients, optional
threshold (default: the enclosing radius, matching ripser), returning
``{"dgms": [np.ndarray (k,2), ...]}``.

Backends:
  - ``python`` — pure-numpy persistent cohomology (tdax.ops.rips.reference),
    the correctness oracle.
  - ``native`` — C++ engine (cpp/tdax_rips.cc) with clearing + emergent
    pair shortcuts, for large clouds.
  - ``auto``   — native when available, else python.
  - ``device`` (batched, via tdax.ops.rips.tiny_device) — whole batches
    of tiny clouds reduced on the TPU in one compiled program; the
    pipeline's persistence_per_layer auto-selects it for the headline
    32 x 36-point sweep.

Persistence diagrams are unique invariants of the filtration, so any
correct backend matches ripser to floating-point round-off — the
<=1e-5 bottleneck parity bar in BASELINE.json.
"""

from tdax.ops.rips.api import rips, rips_from_distances

__all__ = ["rips", "rips_from_distances"]

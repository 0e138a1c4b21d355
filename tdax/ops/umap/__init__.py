"""TPU-native UMAP.

Re-implements the reference's umap-learn dependency as-used
(SURVEY §2.2): cosine/euclidean kNN, smooth-kNN sigma calibration,
fuzzy simplicial set, spectral initialization, and the SGD
cross-entropy layout — as pure JAX, jit-able and vmappable over a
leading batch-of-clouds axis (the 32-layer sweep runs as ONE compiled
program on TPU instead of 32 serial Numba fits).

Parity semantics: umap-learn's layout is an asynchronous Numba loop
whose exact float trajectory is unreproducible by design; tdax uses
epoch-synchronous updates with the same gradients, schedules, and
hyperparameters, seeded. The parity bar (SURVEY §7 "hard parts" #2) is
downstream-invariant: persistence/silhouette curves and peak layer on
the resulting clouds, which the pipeline tests enforce.
"""

from tdax.ops.umap.umap import (UMAP, fit_transform_batched,
                                shared_transform_batched)

__all__ = ["UMAP", "fit_transform_batched", "shared_transform_batched"]

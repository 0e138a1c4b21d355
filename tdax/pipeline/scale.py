"""Large-cloud Vietoris-Rips: the 10k-point / H2 / raw-4096-d path.

BASELINE.json configs[4] scales the TDA kernels themselves (SURVEY §5:
point-cloud size is this project's scale axis).  Division of labor:

  * the O(n^2 d) distance matrix runs on TPU — Pallas tile kernel on a
    single chip, shard_map row-blocks over a mesh;
  * H0 runs on TPU (Boruvka MST, tdax.ops.rips.mst) — no edge sort;
  * H1/H2 run in the native C++ cohomology engine on the host with an
    explicit threshold (at 10k points a threshold is how VR-H2 is done
    anywhere, ripser included: the full complex has ~1.7e11 triangles).

Returns ripser-compatible diagrams.

Precision: the device distance matrix uses the f32 MXU expansion form
(|x|^2+|y|^2-2xy), accurate to ~1e-4 relative on distance values — the
right trade at 4e11 FLOPs.  The parity-critical small-cloud path
(tdax.ops.rips.api.rips) uses exact f64 difference-form distances and
holds the 1e-5 bottleneck bar.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from tdax.ops.rips import rips_from_distances
from tdax.ops.rips.mst import h0_diagram_tpu


def distance_matrix_tpu(x: np.ndarray, mesh=None, use_pallas: bool = True) -> np.ndarray:
    """[n, d] -> [n, n] Euclidean distances, computed on device."""
    xj = jnp.asarray(np.asarray(x), dtype=jnp.float32)
    if mesh is not None:
        from tdax.parallel.sharded_ops import sharded_pairwise_sq_euclidean
        d2 = sharded_pairwise_sq_euclidean(xj, mesh)
        d = jnp.sqrt(jnp.maximum(d2, 0.0))
    elif use_pallas and jax.devices()[0].platform == "tpu":
        from tdax.ops.pallas_distances import pairwise_euclidean_pallas
        d = pairwise_euclidean_pallas(xj)
    else:
        from tdax.ops.distances import pairwise_euclidean
        d = pairwise_euclidean(xj)
    d = np.asarray(d, dtype=np.float32)
    # exact symmetry for the combinatorial engine; stays f32 — the native
    # engine's f32 path is exactly as accurate on f32-derived values
    return ((d + d.T) * np.float32(0.5)).astype(np.float32)


def rips_at_scale(x: np.ndarray, maxdim: int = 2, thresh: float = np.inf,
                  mesh=None, h0_on_device: bool = True) -> dict:
    """VR persistence of a large cloud; distances + H0 on TPU, H1+ native."""
    dist = distance_matrix_tpu(x, mesh=mesh)
    if maxdim == 0 and h0_on_device:
        return {"dgms": [h0_diagram_tpu(dist, thresh)]}
    result = rips_from_distances(dist, maxdim=maxdim, thresh=thresh)
    if h0_on_device:
        # cross-check path: on-device H0 replaces the engine's dim-0 output
        result["dgms"][0] = h0_diagram_tpu(dist, thresh)
    return result

"""tdax — a TPU-native framework for topological data analysis of VLM activations.

A ground-up JAX/XLA/Pallas/pjit re-design of the capabilities of
``Princeton-Applied-Geometry-Topology/tda-multimodal`` (the "Geometric
Phases of VLM Reasoning" pipeline): synthetic compositional datasets,
Qwen-VL activation extraction, UMAP dimensionality reduction,
Vietoris-Rips persistent homology, geometry metrics, and per-layer
evolution analysis — designed for TPU hardware from the start.

Layer map (mirrors reference SURVEY §1):
  - ``tdax.data``      — dataset generation + artifact IO        (L1)
  - ``tdax.models``    — Qwen-VL on TPU, batched capture          (L2)
  - ``tdax.ops``       — UMAP / Rips-PH / distance kernels        (L3 compute)
  - ``tdax.metrics``   — silhouette, persistence, geometry        (L3/L5)
  - ``tdax.pipeline``  — sweep orchestration, artifacts           (L3)
  - ``tdax.viz``       — diagrams, evolution plots, 3-D scatter   (L4)
  - ``tdax.parallel``  — device mesh, sharding, training step
"""

__version__ = "0.1.0"

# Top-level convenience API (lazy: keeps `import tdax` light)
def __getattr__(name):
    if name == "rips":
        from tdax.ops.rips import rips
        return rips
    if name == "UMAP":
        from tdax.ops.umap import UMAP
        return UMAP
    if name == "silhouette_score":
        from tdax.metrics import silhouette_score
        return silhouette_score
    if name == "bottleneck_distance":
        from tdax.metrics import bottleneck_distance
        return bottleneck_distance
    if name == "wasserstein_distance":
        from tdax.metrics import wasserstein_distance
        return wasserstein_distance
    raise AttributeError(f"module 'tdax' has no attribute {name!r}")

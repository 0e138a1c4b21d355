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

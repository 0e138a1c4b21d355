"""Host-side visualization (reference layer L4): persistence diagrams,
per-layer evolution plots, interactive 3-D scatters."""

from tdax.viz.diagrams import plot_diagrams
from tdax.viz.evolution import plot_evolution_2x2, plot_evolution_1x3
from tdax.viz.scatter3d import write_scatter3d_html

__all__ = ["plot_diagrams", "plot_evolution_2x2", "plot_evolution_1x3",
           "write_scatter3d_html"]

#!/usr/bin/env python
"""Interactive 3-D visualization of the peak layer's UMAP embedding.

Drop-in entry point for the reference's ``visualize.py`` (README calls
it ``visualize_peak_layer.py`` — both names are provided here; SURVEY
§2.1 normalization note): loads
``{DEBUG_DIR}/point_clouds_3d/layer_{PEAK_LAYER}_cloud.npy``, filters
metadata to type "bound", and writes two interactive HTML scatter plots
(colored-by-color/symbol-by-shape and the transpose) plus static PNG
fallbacks.

PEAK_LAYER can be overridden on the command line:
``python visualize_peak_layer.py [peak_layer] [debug_dir]``.
"""

import json
import os
import sys

import numpy as np

from tdax.config import DatasetConfig
from tdax.viz.scatter3d import write_scatter3d_html

PEAK_LAYER = 25          # reference visualize.py:10 (hand-edited there)
DEBUG_DIR = "tda-output"  # reference visualize.py:12


def main(peak_layer: int = PEAK_LAYER, debug_dir: str = DEBUG_DIR) -> None:
    ds = DatasetConfig()
    if not os.path.isdir(debug_dir) and os.path.isdir("tda_debug_output"):
        debug_dir = "tda_debug_output"

    cloud_file = os.path.join(debug_dir, "point_clouds_3d", f"layer_{peak_layer}_cloud.npy")
    print(f"Loading 3D point cloud from {cloud_file}...")
    cloud_3d = np.load(cloud_file)

    print(f"Loading metadata from {ds.metadata_path}...")
    with open(ds.metadata_path) as f:
        all_metadata = json.load(f)
    bound = [m for m in all_metadata if m["type"] == "bound"]
    print(f"Loaded {len(bound)} metadata entries.")
    if len(bound) != cloud_3d.shape[0]:
        print(f"Error: Metadata count ({len(bound)}) does not match point "
              f"cloud size ({cloud_3d.shape[0]})")
        raise SystemExit(1)
    # cloud rows follow sorted sample ids (debug_tda_pipeline.py:46-49)
    bound = sorted(bound, key=lambda m: m["id"])

    colors = [m["color"] for m in bound]
    shapes = [m["shape"] for m in bound]
    ids = [m["id"] for m in bound]

    print("Generating 3D plot colored by 'color'...")
    color_path = os.path.join(debug_dir, f"layer_{peak_layer}_3D_plot_by_color.html")
    write_scatter3d_html(cloud_3d, colors, shapes, ids, color_path,
                         title=f"Layer {peak_layer} UMAP Embedding (Colored by Color)")
    print(f"Saved color plot to {color_path}")

    print("Generating 3D plot colored by 'shape'...")
    shape_path = os.path.join(debug_dir, f"layer_{peak_layer}_3D_plot_by_shape.html")
    write_scatter3d_html(cloud_3d, shapes, colors, ids, shape_path,
                         title=f"Layer {peak_layer} UMAP Embedding (Colored by Shape)")
    print(f"Saved shape plot to {shape_path}")


if __name__ == "__main__":
    args = sys.argv[1:]
    main(int(args[0]) if args else PEAK_LAYER,
         args[1] if len(args) > 1 else DEBUG_DIR)

#!/usr/bin/env python
"""Reproduce the reference's committed tda-output/ through tdax.

Runs the persistence stage on the reference's own committed 3-D UMAP
clouds (tda-output/point_clouds_3d/layer_*.npy) and regenerates
summary_stats.json (in the committed file's exact pre-silhouette key
schema), the per-layer diagram PNGs, and the evolution plot — then
diffs against the committed summary_stats.json and prints the maximum
deviation.  This is the strongest end-to-end parity demonstration
available without the model checkpoint: same input data, independent
engine, matching science.

Usage: python reproduce_golden.py [reference_tda_output] [out_dir]
"""

import json
import os
import sys

import numpy as np


def main(ref_dir: str = "/root/reference/tda-output",
         out_dir: str = "tda-output-reproduced") -> None:
    from tdax.data.io import dump_json, ensure_dir
    from tdax.metrics.persistence import get_persistence
    from tdax.ops.rips import rips
    from tdax.viz.diagrams import save_diagram_png

    ensure_dir(os.path.join(out_dir, "diagrams"))
    with open(os.path.join(ref_dir, "summary_stats.json")) as f:
        golden = json.load(f)

    stats = []
    worst = 0.0
    for entry in golden:
        i = entry["layer"]
        cloud = np.load(os.path.join(ref_dir, "point_clouds_3d",
                                     f"layer_{i}_cloud.npy"))
        dgms = rips(cloud, maxdim=1)["dgms"]
        h0_pers, max_h0 = get_persistence(dgms[0])
        h1_pers, max_h1 = get_persistence(dgms[1])
        stats.append({
            "layer": i,
            "n_h1_features": int(len(h1_pers)),
            "max_h1_persistence": float(max_h1),
            "all_h1_persistence_values": [float(v) for v in h1_pers],
            "n_h0_features": int(len(dgms[0]) - len(h0_pers)),
            "max_h0_persistence": float(max_h0),
        })
        save_diagram_png(dgms, os.path.join(out_dir, "diagrams",
                                            f"layer_{i}_diagram.png"),
                         title=f"Layer {i} Diagram")

        # count asserts FIRST: a feature-count regression must report the
        # layer, not die in a broadcast error inside the deviation math
        assert len(h1_pers) == entry["n_h1_features"], f"layer {i}"
        assert stats[-1]["n_h0_features"] == entry["n_h0_features"], f"layer {i}"
        worst = max(worst,
                    abs(max_h0 - entry["max_h0_persistence"]),
                    abs(max_h1 - entry["max_h1_persistence"]),
                    float(np.max(np.abs(
                        np.sort(h1_pers) -
                        np.sort(entry["all_h1_persistence_values"])))
                        if len(h1_pers) else 0.0))

    dump_json(stats, os.path.join(out_dir, "summary_stats.json"))

    from tdax.viz.evolution import plot_evolution_1x3
    plot_evolution_1x3(stats, os.path.join(out_dir, "summary_evolution_plot.png"))

    peak = int(np.argmax([s["max_h1_persistence"] for s in stats]))
    print(f"Reproduced {len(stats)} layers into {out_dir}/")
    print(f"Max deviation from committed ripser values: {worst:.3e} "
          f"(parity bar: 1e-5)")
    print(f"Peak max-H1 layer: {peak} (committed run: 25)")


if __name__ == "__main__":
    main(*sys.argv[1:3])

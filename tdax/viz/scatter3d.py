"""Interactive 3-D scatter HTML writer.

Behavioral contract: the reference's plotly express scatter_3d HTML
artifacts (visualize.py:51-81) — points colored by one label set,
symboled by another, hover text per point, written as a standalone
interactive HTML file.  The plotly *python* package is not a
dependency: the writer emits a self-contained HTML document that loads
plotly.js from CDN and calls Plotly.newPlot with the embedded data —
the same artifact class a plotly user gets, with zero host-side deps.
A static matplotlib PNG fallback accompanies it for offline viewing.
"""

from __future__ import annotations

import json

import numpy as np

_SYMBOLS = ["circle", "square", "diamond", "cross", "x", "circle-open",
            "square-open", "diamond-open"]
_MPL_MARKERS = ["o", "s", "D", "P", "X", "^", "v", "*"]
_PALETTE = ["#636efa", "#EF553B", "#00cc96", "#ab63fa", "#FFA15A",
            "#19d3f3", "#FF6692", "#B6E880"]

_TEMPLATE = """<!DOCTYPE html>
<html>
<head><meta charset="utf-8"/>
<script src="https://cdn.plot.ly/plotly-2.27.0.min.js"></script>
</head>
<body>
<div id="plot" style="width:100%;height:95vh;"></div>
<script>
var traces = __TRACES__;
var layout = __LAYOUT__;
Plotly.newPlot('plot', traces, layout);
</script>
</body>
</html>
"""


def write_scatter3d_html(cloud: np.ndarray, color_labels, symbol_labels,
                         hover_text, out_path: str, title: str = "",
                         png_fallback: bool = True) -> None:
    cloud = np.asarray(cloud, dtype=float)
    color_labels = [str(c) for c in color_labels]
    symbol_labels = [str(s) for s in symbol_labels]
    hover_text = [str(h) for h in hover_text]

    uniq_colors = sorted(set(color_labels))
    uniq_symbols = sorted(set(symbol_labels))
    traces = []
    for ci, cval in enumerate(uniq_colors):
        for si, sval in enumerate(uniq_symbols):
            sel = [k for k in range(len(cloud))
                   if color_labels[k] == cval and symbol_labels[k] == sval]
            if not sel:
                continue
            traces.append({
                "type": "scatter3d",
                "mode": "markers",
                "name": f"{cval}, {sval}",
                "x": cloud[sel, 0].tolist(),
                "y": cloud[sel, 1].tolist(),
                "z": cloud[sel, 2].tolist(),
                "text": [hover_text[k] for k in sel],
                "hoverinfo": "text",
                "marker": {
                    "size": 5,
                    "color": _PALETTE[ci % len(_PALETTE)],
                    "symbol": _SYMBOLS[si % len(_SYMBOLS)],
                },
            })
    layout = {
        "title": {"text": title},
        "template": "plotly_white",
        "scene": {"xaxis": {"title": "x"}, "yaxis": {"title": "y"},
                  "zaxis": {"title": "z"}},
    }
    html = (_TEMPLATE
            .replace("__TRACES__", json.dumps(traces))
            .replace("__LAYOUT__", json.dumps(layout)))
    with open(out_path, "w") as f:
        f.write(html)

    if png_fallback:
        import matplotlib
        matplotlib.use("Agg", force=False)
        import matplotlib.pyplot as plt
        fig = plt.figure(figsize=(8, 7))
        ax = fig.add_subplot(projection="3d")
        for ci, cval in enumerate(uniq_colors):
            for si, sval in enumerate(uniq_symbols):
                sel = [k for k in range(len(cloud))
                       if color_labels[k] == cval and symbol_labels[k] == sval]
                if not sel:
                    continue
                ax.scatter(cloud[sel, 0], cloud[sel, 1], cloud[sel, 2],
                           c=_PALETTE[ci % len(_PALETTE)],
                           marker=_MPL_MARKERS[si % len(_MPL_MARKERS)], s=24,
                           label=f"{cval}, {sval}" if len(uniq_symbols) == 1 else None)
        ax.set_title(title)
        if len(uniq_symbols) == 1:
            ax.legend(fontsize=7, loc="upper left", ncol=2)
        fig.savefig(out_path.rsplit(".", 1)[0] + ".png", dpi=110)
        plt.close(fig)

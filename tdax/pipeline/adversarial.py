"""Adversarial compositional-binding TDA analysis.

TPU-native successor of the reference's
``experiments/adversarial_compositional_binding/analyze_adversarial_tda.py``:
4 conditions x 32 layers = 128 independent UMAP+PH jobs (SURVEY §3.4),
run as one batched embedding + silhouette program per condition and a
thread pool of native PH reductions, with the reference's artifact tree
(``{condition}/{diagrams,point_clouds}``, ``layer_stats.json``,
``comparison/all_conditions_comparison.png``, ``summary.json``) and
stat schema (analyze_adversarial_tda.py:113-122) byte-compatible.
"""

from __future__ import annotations

import os

import numpy as np

from tdax.config import SweepConfig
from tdax.data.adversarial import CONDITIONS
from tdax.data.io import activations_to_layer_clouds, dump_json, ensure_dir
from tdax.metrics.persistence import get_persistence
from tdax.pipeline.tda_sweep import embed_and_silhouettes, persistence_per_layer
from tdax.viz.diagrams import save_diagram_png


def _pin_protocol(cfg: SweepConfig) -> SweepConfig:
    """The reference uses a fresh per-condition UMAP with
    n_neighbors=min(6, len(samples)-1) HARD-CODED
    (analyze_adversarial_tda.py:85-91) — not inherited from the main
    sweep's knob — and per-layer fit unconditionally (cfg.reducer_mode
    is the MAIN sweep's legacy shared-camera switch).  Both are pinned
    so a caller's non-default main-sweep config cannot silently change
    the adversarial protocol; embed_and_silhouettes applies the
    min(n_neighbors, n-1) clamp on top."""
    if cfg.reducer_mode != "per_layer" or cfg.umap.n_neighbors != 6:
        import dataclasses
        cfg = dataclasses.replace(
            cfg, reducer_mode="per_layer",
            umap=dataclasses.replace(cfg.umap, n_neighbors=6))
    return cfg


def compute_tda_for_condition(condition: str, clouds: np.ndarray,
                              labels: dict[str, list[str]],
                              output_subdir: str, cfg: SweepConfig,
                              verbose: bool = True,
                              _embedded=None, _render_pool=None,
                              _render_futures=None) -> list[dict]:
    """clouds [L, n, hidden]; labels: img_color/img_shape/txt_color/txt_shape.

    ``_embedded``: optional precomputed (clouds_3d, silhouettes) from
    ``embed_and_silhouettes`` under the pinned protocol config — the
    overlapped sweep (run_adversarial_sweep) dispatches all conditions'
    embed programs concurrently and hands the results in here.
    ``_render_pool``/``_render_futures``: when given, diagram PNGs are
    SUBMITTED to the shared pool and their futures appended instead of
    rendered synchronously — the sweep joins them once at the end, so
    one condition's 32 matplotlib renders never gate the next
    condition's stats (the measured ~1/3 of the sweep's host tail)."""
    if verbose:
        print(f"\n--- Analyzing {condition} ---")
    diag_dir = ensure_dir(os.path.join(output_subdir, "diagrams"))
    cloud_dir = ensure_dir(os.path.join(output_subdir, "point_clouds"))

    cfg = _pin_protocol(cfg)
    clouds_3d, sil = (_embedded if _embedded is not None
                      else embed_and_silhouettes(clouds, cfg, labels))
    dgms_per_layer = persistence_per_layer(clouds_3d, maxdim=cfg.rips.maxdim,
                                           backend=cfg.rips.backend)

    all_stats = []
    for i in range(cfg.n_layers):
        if cfg.save_clouds:
            np.save(os.path.join(cloud_dir, f"layer_{i}_cloud.npy"), clouds_3d[i])
        dgms = dgms_per_layer[i]
        _, max_h0 = get_persistence(dgms[0])
        h1_pers, max_h1 = get_persistence(dgms[1])
        stats = {
            "layer": i,
            "n_h1_features": int(len(h1_pers)),
            "max_h1_persistence": float(max_h1),
            "max_h0_persistence": float(max_h0),
            "silhouette_img_color": float(sil["img_color"][i]),
            "silhouette_img_shape": float(sil["img_shape"][i]),
            "silhouette_txt_color": float(sil["txt_color"][i]),
            "silhouette_txt_shape": float(sil["txt_shape"][i]),
        }
        all_stats.append(stats)

    if cfg.save_diagrams:
        import concurrent.futures as cf

        def render(i: int) -> None:
            s = all_stats[i]
            save_diagram_png(dgms_per_layer[i],
                             os.path.join(diag_dir, f"layer_{i}_diagram.png"),
                             title=f"{condition} - Layer {i} | "
                                   f"H1={s['n_h1_features']} | "
                                   f"Max Pers={s['max_h1_persistence']:.3f}")
        if _render_pool is not None:
            _render_futures.extend(
                _render_pool.submit(render, i) for i in range(cfg.n_layers))
        else:
            with cf.ThreadPoolExecutor(max_workers=4) as pool:
                list(pool.map(render, range(cfg.n_layers)))

    dump_json(all_stats, os.path.join(output_subdir, "layer_stats.json"))
    return all_stats


def plot_comparison(condition_stats: dict[str, list[dict]], n_layers: int,
                    out_path: str) -> None:
    """The 2x3 cross-condition figure incl. the persistence-disruption
    metric matched - mismatched (analyze_adversarial_tda.py:158-239)."""
    import matplotlib
    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(2, 3, figsize=(18, 12))
    layers = range(n_layers)

    panels = [
        (axes[0, 0], "max_h1_persistence", "Max H1 Persistence by Condition", "Max Persistence"),
        (axes[0, 1], "n_h1_features", "Number of H1 Features by Condition", "Number of Features"),
        (axes[0, 2], "silhouette_img_color", "Image Color Clustering (by actual image)", "Silhouette Score"),
        (axes[1, 0], "silhouette_txt_color", "Text Color Clustering (by text prompt)", "Silhouette Score"),
        (axes[1, 1], "silhouette_img_shape", "Image Shape Clustering", "Silhouette Score"),
    ]
    for ax, key, title, ylabel in panels:
        for condition in CONDITIONS:
            if condition in condition_stats:
                ax.plot(layers, [s[key] for s in condition_stats[condition]],
                        "o-", label=condition, linewidth=2)
        ax.set_title(title)
        ax.set_xlabel("Layer")
        ax.set_ylabel(ylabel)
        ax.legend()
        ax.grid(True)

    ax = axes[1, 2]
    if "matched" in condition_stats:
        matched = np.array([s["max_h1_persistence"] for s in condition_stats["matched"]])
        for condition in ("color_mismatch", "shape_mismatch", "both_mismatch"):
            if condition in condition_stats:
                mism = np.array([s["max_h1_persistence"] for s in condition_stats[condition]])
                ax.plot(layers, matched - mism, "o-",
                        label=f"{condition} disruption", linewidth=2)
    ax.set_title("Persistence Disruption: Matched - Mismatched")
    ax.set_xlabel("Layer")
    ax.set_ylabel("Persistence Difference")
    ax.legend()
    ax.grid(True)
    ax.axhline(y=0, color="k", linestyle="--", alpha=0.3)

    plt.tight_layout()
    plt.savefig(out_path)
    plt.close(fig)


def run_adversarial_sweep(all_data: dict[str, dict], output_dir: str,
                          cfg: SweepConfig | None = None,
                          verbose: bool = True) -> dict:
    cfg = cfg or SweepConfig()
    ensure_dir(os.path.join(output_dir, "comparison"))

    first = next(iter(all_data.values()))
    n_avail = len(first["activations"])
    if n_avail < cfg.n_layers:
        import dataclasses
        cfg = dataclasses.replace(cfg, n_layers=n_avail)

    n_per_condition: dict[str, int] = {}
    condition_stats: dict[str, list[dict]] = {}
    cond_inputs: list[tuple[str, np.ndarray, dict[str, list[str]]]] = []
    for condition in CONDITIONS:
        clouds, ids = activations_to_layer_clouds(
            all_data, cfg.n_layers, point_cloud_type=None, condition=condition)
        if not ids:
            if verbose:
                print(f"Warning: No samples for {condition}")
            continue
        n_per_condition[condition] = len(ids)
        labels = {
            "img_color": [all_data[i]["metadata"]["img_color"] for i in ids],
            "img_shape": [all_data[i]["metadata"]["img_shape"] for i in ids],
            "txt_color": [all_data[i]["metadata"]["txt_color"] for i in ids],
            "txt_shape": [all_data[i]["metadata"]["txt_shape"] for i in ids],
        }
        cond_inputs.append((condition, clouds, labels))

    # Overlapped fan-out (VERDICT r3 #7): the 4 conditions' fused
    # embed+silhouette programs trace/compile/dispatch CONCURRENTLY in
    # threads (jit is thread-safe; XLA compiles release the GIL, so the
    # three distinct-n compilations overlap each other and the device
    # compute), instead of serial compile->run->PH per condition.  The
    # per-condition host PH + artifact stage then runs as each result
    # lands, overlapping the remaining conditions' device compute.
    acfg = _pin_protocol(cfg)
    import concurrent.futures as cf
    render_futures: list = []
    with cf.ThreadPoolExecutor(max_workers=8) as render_pool:
        if len(cond_inputs) > 1:
            with cf.ThreadPoolExecutor(max_workers=len(cond_inputs)) as pool:
                futures = [pool.submit(embed_and_silhouettes, clouds, acfg,
                                       labels)
                           for _, clouds, labels in cond_inputs]
                # consume per-condition: waiting only on THIS condition's
                # future lets its host PH stage run while the later
                # conditions' device programs are still executing; PNG
                # renders go to the shared fire-and-forget pool
                for (condition, clouds, labels), fut in zip(cond_inputs,
                                                            futures):
                    condition_stats[condition] = compute_tda_for_condition(
                        condition, clouds, labels,
                        os.path.join(output_dir, condition), acfg,
                        verbose=verbose, _embedded=fut.result(),
                        _render_pool=render_pool,
                        _render_futures=render_futures)
        else:
            for condition, clouds, labels in cond_inputs:
                condition_stats[condition] = compute_tda_for_condition(
                    condition, clouds, labels,
                    os.path.join(output_dir, condition),
                    acfg, verbose=verbose,
                    _embedded=embed_and_silhouettes(clouds, acfg, labels),
                    _render_pool=render_pool,
                    _render_futures=render_futures)
        for f in render_futures:
            f.result()  # surface render exceptions; joins before return

    plot_comparison(condition_stats, cfg.n_layers,
                    os.path.join(output_dir, "comparison",
                                 "all_conditions_comparison.png"))

    summary = {
        "condition_stats": condition_stats,
        "n_samples_per_condition": n_per_condition,
    }
    dump_json(summary, os.path.join(output_dir, "summary.json"))
    if verbose:
        print(f"\n--- Analysis Complete ---\nResults saved to: {output_dir}")
    return summary

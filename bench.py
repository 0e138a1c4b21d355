#!/usr/bin/env python
"""tdax headline benchmark.

Metric: wall-clock of the full per-layer TDA sweep — 32 layers x (UMAP
4096-d -> 3-d + Vietoris-Rips H0/H1 + 2 silhouettes) on the 6x6
dataset's 36-point clouds — the reference pipeline's hot path
(debug_tda_pipeline.py:92-150) against BASELINE.json's <60 s v5e-8
target.  Warm timing (compile excluded; the persistent cache makes
real reruns warm too).

Also times the same sweep on REAL activations — a toy-model extraction
trajectory over the actual 48-image dataset (regenerated on the fly if
absent; TDAX_BENCH_SKIP_REAL=1 skips) — so the scored path is also
exercised on real activation statistics (scale/anisotropy), not only
planted gaussians.  That row prints FIRST; the headline synthetic row
is the LAST line (the driver parses the last JSON line).

Prints one JSON line per row: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import numpy as np

BASELINE_SECONDS = 60.0  # BASELINE.json north-star target
N_LAYERS, N_SAMPLES, HIDDEN = 32, 36, 4096


def make_clouds(seed: int = 42) -> tuple[np.ndarray, list[str], list[str]]:
    """Synthetic activation clouds shaped like the real workload
    (32 x 36 x 4096), with shape-clustered structure at one layer."""
    rng = np.random.default_rng(seed)
    shapes = [f"s{i}" for i in range(6)]
    colors = [f"c{i}" for i in range(6)]
    shape_labels = [shapes[i // 6] for i in range(N_SAMPLES)]
    color_labels = [colors[i % 6] for i in range(N_SAMPLES)]
    clouds = rng.normal(size=(N_LAYERS, N_SAMPLES, HIDDEN))
    centers = rng.normal(size=(6, HIDDEN)) * 3
    for j in range(N_SAMPLES):
        clouds[25, j] = centers[j // 6] + rng.normal(0, 0.5, HIDDEN)
    return clouds, shape_labels, color_labels


def run_sweep(clouds, shape_labels, color_labels):
    from tdax.config import SweepConfig
    from tdax.pipeline.tda_sweep import (embed_and_silhouettes,
                                         persistence_per_layer)

    cfg = SweepConfig()
    clouds_3d, sil = embed_and_silhouettes(
        clouds, cfg, {"shape": shape_labels, "color": color_labels})
    dgms = persistence_per_layer(clouds_3d, maxdim=1)
    return clouds_3d, sil, dgms


def real_activation_clouds() -> tuple[np.ndarray, list[str], list[str]] | None:
    """The toy-extraction trajectory over the real 48-image dataset:
    [n_layers, 36, hidden] bound-sample clouds + labels.  Regenerates
    the dataset/extraction if the artifacts are missing."""
    meta_path = "data/physics_experiment_6x6/metadata.json"
    acts_path = os.environ.get("TDAX_BENCH_ACTS",
                               "data/physics_experiment_6x6/all_activations.npz")
    from tdax.config import DatasetConfig, ExtractConfig
    from tdax.data import generate_dataset
    from tdax.data.io import load_activations, load_metadata

    # metadata.json is committed but the PNGs are gitignored — regenerate
    # whenever any image referenced by the metadata is missing
    if not os.path.exists(meta_path) or not all(
            os.path.exists(m["image_path"]) for m in load_metadata(meta_path)):
        generate_dataset(DatasetConfig())
    if not os.path.exists(acts_path):
        from tdax.models.qwen_vl import QwenVLConfig
        from tdax.pipeline.extract import extract_activations
        extract_activations(
            load_metadata(meta_path),
            acts_path.replace(".npz", ".pt"),
            QwenVLConfig.tiny(dtype="float32"),
            ExtractConfig(model_dir=None, batch_size=16, save_interval=1000),
            verbose=False)

    data = load_activations(acts_path)
    meta = {m["id"]: m for m in load_metadata(meta_path)}
    bound = [sid for sid in sorted(data) if meta[sid]["type"] == "bound"]
    n_layers = len(data[bound[0]]["activations"])
    clouds = np.stack([
        np.stack([data[sid]["activations"][f"layer_{i}"] for sid in bound])
        for i in range(n_layers)]).astype(np.float64)
    return (clouds, [meta[s]["shape"] for s in bound],
            [meta[s]["color"] for s in bound])


def main() -> None:
    from tdax.utils import setup_runtime

    setup_runtime(want_device=True)

    # --- realistic-statistics row (real images -> real activations) ------
    if os.environ.get("TDAX_BENCH_SKIP_REAL") != "1":
        real = real_activation_clouds()
        rc, rs, rcol = real
        run_sweep(rc, rs, rcol)  # warm-up / compile
        t0 = time.time()
        run_sweep(rc, rs, rcol)
        real_elapsed = time.time() - t0
        l, _, h = rc.shape
        print(json.dumps({
            "metric": f"umap_ph_sweep_real_toytraj_{l}layers_36x{h}",
            "value": round(real_elapsed, 3), "unit": "s",
            "per_layer_ms": round(real_elapsed / l * 1000, 1),
            "vs_baseline": None}))

    # --- headline row (the BASELINE.json-shaped synthetic workload) ------
    clouds, shape_labels, color_labels = make_clouds()

    # HBM-resident variant first: the product path — activation clouds
    # come straight out of model capture and never visit the host, so
    # the sweep is timed without the 18 MB host->device upload (which
    # crosses a ~30 MB/s relay in this session and dominates otherwise)
    # headline rows report min/median/max of 5 timed runs: single shots
    # on the relayed chip see dispatch-latency spikes of 2-3x, and
    # without the spread, round-over-round drift under ~20% is
    # indistinguishable from that noise (each run varies an input
    # element — the relay dedupes identical dispatches)
    def timed5(cs, n_runs=5):
        ts = []
        for _ in range(n_runs):
            cs = bump(cs)
            t0 = time.time()
            out = run_sweep(cs, shape_labels, color_labels)
            ts.append(time.time() - t0)
        ts.sort()
        spread = {"min_s": round(ts[0], 3),
                  "median_s": round(ts[len(ts) // 2], 3),
                  "max_s": round(ts[-1], 3), "n_runs": n_runs}
        return ts[len(ts) // 2], spread, out

    import jax.numpy as jnp
    clouds_dev = jnp.asarray(clouds, dtype=jnp.float32)
    clouds_dev.block_until_ready()

    def bump(cs):
        if isinstance(cs, np.ndarray):
            cs = cs.copy()
            cs[0, 0, 0] += 1e-6
            return cs
        cs = cs.at[0, 0, 0].add(1e-6)
        cs.block_until_ready()
        return cs

    run_sweep(clouds_dev, shape_labels, color_labels)  # warm-up / compile
    hbm_elapsed, hbm_spread, _ = timed5(clouds_dev)
    print(json.dumps({
        "metric": "umap_ph_sweep_32layers_36x4096_hbm",
        "value": round(hbm_elapsed, 3), "unit": "s", **hbm_spread,
        "vs_baseline": round(BASELINE_SECONDS / hbm_elapsed, 2)}))

    run_sweep(clouds, shape_labels, color_labels)  # warm-up / compile
    elapsed, spread, (_, sil, dgms) = timed5(clouds)

    assert int(np.argmax(sil["shape"])) == 25, "sanity: planted peak layer"
    assert all(len(d) == 2 for d in dgms)

    print(json.dumps({
        "metric": "umap_ph_sweep_32layers_36x4096",
        "value": round(elapsed, 3),
        "unit": "s", **spread,
        "vs_baseline": round(BASELINE_SECONDS / elapsed, 2),
    }))


if __name__ == "__main__":
    main()

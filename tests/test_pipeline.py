"""End-to-end pipeline tests on synthetic activations: artifact tree,
JSON schema parity with the reference, and peak-layer detection."""

import json
import os

import numpy as np
import pytest

from tdax.config import DatasetConfig, RipsConfig, SweepConfig, UMAPConfig
from tdax.data import generate_dataset
from tdax.data.adversarial import generate_adversarial_metadata
from tdax.data.io import load_activations, save_activations
from tdax.pipeline import run_adversarial_sweep, run_tda_sweep

N_LAYERS = 4
HIDDEN = 64


def synthetic_activations(metadata, peak_layer=2, hidden=HIDDEN, seed=0,
                          cluster_key="shape"):
    """[L, n, hidden] activations where ``peak_layer`` clusters by
    ``cluster_key`` and other layers are unstructured."""
    rng = np.random.default_rng(seed)
    ids = [m["id"] for m in metadata]
    keys = sorted({m[cluster_key] for m in metadata})
    centers = rng.normal(size=(len(keys), hidden)) * 5
    acts = rng.normal(size=(N_LAYERS, len(ids), hidden))
    for j, m in enumerate(metadata):
        acts[peak_layer, j] = centers[keys.index(m[cluster_key])] + rng.normal(0, 0.3, hidden)
    return acts.astype(np.float32), ids


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("pipeline")
    cfg = DatasetConfig(data_dir=str(root / "data/physics_experiment_6x6"))
    metadata = generate_dataset(cfg, render=False)
    bound = [m for m in metadata if m["type"] == "bound"]
    acts, ids = synthetic_activations(metadata)
    npz = str(root / "all_activations.npz")
    save_activations(npz, acts, ids, metadata)
    return root, cfg, metadata, npz


def sweep_cfg(outdir, save_diagrams=True, **kw):
    return SweepConfig(
        n_layers=N_LAYERS, output_dir=str(outdir),
        umap=UMAPConfig(n_epochs=100), rips=RipsConfig(),
        save_diagrams=save_diagrams, **kw)


def test_npz_pt_roundtrip(workspace, tmp_path):
    root, cfg, metadata, npz = workspace
    a = load_activations(npz)
    pt = str(tmp_path / "acts.pt")
    acts, ids = synthetic_activations(metadata)
    save_activations(pt, acts, ids, metadata)
    b = load_activations(pt)
    assert set(a) == set(b)
    sid = sorted(a)[0]
    np.testing.assert_allclose(a[sid]["activations"]["layer_1"],
                               b[sid]["activations"]["layer_1"], rtol=1e-6)
    assert a[sid]["metadata"] == b[sid]["metadata"]


def test_sweep_end_to_end(workspace, tmp_path):
    root, cfg, metadata, npz = workspace
    all_data = load_activations(npz)
    out = tmp_path / "tda_debug_output"
    result = run_tda_sweep(all_data, cfg.metadata_path, sweep_cfg(out), verbose=False)

    # peak layer found by shape silhouette (synthetic structure at layer 2)
    assert result["peak_layer"] == 2

    # artifact tree matches reference layout
    assert (out / "summary_stats.json").exists()
    assert (out / "summary_evolution_plot.png").exists()
    for i in range(N_LAYERS):
        assert (out / "point_clouds_3d" / f"layer_{i}_cloud.npy").exists()
        assert (out / "diagrams" / f"layer_{i}_diagram.png").exists()

    with open(out / "summary_stats.json") as f:
        stats = json.load(f)
    assert len(stats) == N_LAYERS
    # exact reference schema (debug_tda_pipeline.py:121-130)
    assert list(stats[0]) == ["layer", "n_h1_features", "max_h1_persistence",
                              "all_h1_persistence_values", "n_h0_features",
                              "max_h0_persistence", "silhouette_shape",
                              "silhouette_color"]
    # structured layer separates shapes far better than noise layers
    assert stats[2]["silhouette_shape"] > 0.5
    assert stats[2]["silhouette_shape"] > max(s["silhouette_shape"]
                                              for s in stats if s["layer"] != 2) + 0.2
    # clouds are (36, 3) float32 like the committed artifacts
    cloud = np.load(out / "point_clouds_3d" / "layer_0_cloud.npy")
    assert cloud.shape == (36, 3) and cloud.dtype == np.float32


def test_sweep_output_dir_wiped(workspace, tmp_path):
    root, cfg, metadata, npz = workspace
    all_data = load_activations(npz)
    out = tmp_path / "wipe_out"
    os.makedirs(out)
    stale = out / "stale_file.txt"
    stale.write_text("old")
    run_tda_sweep(all_data, cfg.metadata_path,
                  sweep_cfg(out, save_diagrams=False), verbose=False)
    assert not stale.exists()  # reference wipes the dir each run (:29-32)


def test_shared_reducer_mode(workspace, tmp_path):
    root, cfg, metadata, npz = workspace
    all_data = load_activations(npz)
    out = tmp_path / "legacy_out"
    scfg = SweepConfig(n_layers=N_LAYERS, output_dir=str(out),
                       umap=UMAPConfig(n_neighbors=18, n_epochs=100),
                       reducer_mode="shared", peak_rule="max_h1",
                       save_diagrams=False)
    result = run_tda_sweep(all_data, cfg.metadata_path, scfg, verbose=False)
    assert len(result["stats"]) == N_LAYERS
    assert np.isfinite(result["clouds_3d"]).all()


def test_adversarial_sweep(workspace, tmp_path):
    root, cfg, metadata, npz = workspace
    adv = generate_adversarial_metadata(metadata, cfg, save=False)
    # small subset: 2 base images -> keep runtime sane
    keep_bases = {"red_cube", "blue_sphere"}
    adv = [s for s in adv if s["base_id"] in keep_bases]
    rng = np.random.default_rng(1)
    acts = rng.normal(size=(N_LAYERS, len(adv), HIDDEN)).astype(np.float32)
    ids = [s["id"] for s in adv]
    pt = str(tmp_path / "adv.npz")
    save_activations(pt, acts, ids, adv)
    all_data = load_activations(pt)

    out = tmp_path / "tda_adversarial_output"
    scfg = SweepConfig(n_layers=N_LAYERS, umap=UMAPConfig(n_epochs=60))
    summary = run_adversarial_sweep(all_data, str(out), scfg, verbose=False)

    assert set(summary["n_samples_per_condition"]) == {
        "matched", "color_mismatch", "shape_mismatch", "both_mismatch"}
    for cond in summary["condition_stats"]:
        stats = summary["condition_stats"][cond]
        assert len(stats) == N_LAYERS
        assert list(stats[0]) == ["layer", "n_h1_features", "max_h1_persistence",
                                  "max_h0_persistence", "silhouette_img_color",
                                  "silhouette_img_shape", "silhouette_txt_color",
                                  "silhouette_txt_shape"]
        assert (out / cond / "layer_stats.json").exists()
        assert (out / cond / "point_clouds" / "layer_0_cloud.npy").exists()
        assert (out / cond / "diagrams" / "layer_0_diagram.png").exists()
    assert (out / "comparison" / "all_conditions_comparison.png").exists()
    assert (out / "summary.json").exists()


def test_visualizer_writes_html(workspace, tmp_path, monkeypatch):
    root, cfg, metadata, npz = workspace
    all_data = load_activations(npz)
    out = tmp_path / "viz_out"
    run_tda_sweep(all_data, cfg.metadata_path,
                  sweep_cfg(out, save_diagrams=False), verbose=False)

    from tdax.viz.scatter3d import write_scatter3d_html
    bound = sorted([m for m in metadata if m["type"] == "bound"], key=lambda m: m["id"])
    cloud = np.load(out / "point_clouds_3d" / "layer_2_cloud.npy")
    html = tmp_path / "plot.html"
    write_scatter3d_html(cloud, [m["color"] for m in bound],
                         [m["shape"] for m in bound],
                         [m["id"] for m in bound], str(html), title="t")
    text = html.read_text()
    assert "scatter3d" in text
    # self-contained contract: the artifact must render air-gapped —
    # no external script/style/img fetches of any kind (the reference's
    # plotly write_html embeds plotly.js; reference visualize.py:62-64)
    assert "http://" not in text and "https://" not in text
    assert "<canvas" in text and "addEventListener" in text
    # every bound point's hover text is embedded
    for m in bound:
        assert m["id"] in text
    assert (tmp_path / "plot.png").exists()


def test_fused_embed_silhouettes_matches_separate_stages():
    """embed_and_silhouettes (one jitted program) must produce exactly
    the embed_layers + batched_silhouettes results it fuses."""
    from tdax.pipeline.tda_sweep import (batched_silhouettes,
                                         embed_and_silhouettes, embed_layers)
    rng = np.random.default_rng(11)
    clouds = rng.normal(size=(4, 18, 32))
    labels = {"shape": [f"s{i % 3}" for i in range(18)],
              "color": [f"c{i % 2}" for i in range(18)]}
    cfg = SweepConfig(umap=UMAPConfig(n_neighbors=5, n_components=3,
                                      random_state=42, metric="cosine",
                                      n_epochs=60))
    sep_clouds = embed_layers(clouds, cfg).astype(np.float32)
    sep_sil = batched_silhouettes(sep_clouds, labels)
    fus_clouds, fus_sil = embed_and_silhouettes(clouds, cfg, labels)
    np.testing.assert_allclose(fus_clouds, sep_clouds, rtol=1e-6, atol=1e-6)
    for k in labels:
        np.testing.assert_allclose(fus_sil[k], sep_sil[k], rtol=1e-6, atol=1e-6)


def test_fused_shared_mode_matches_separate_stages():
    """Shared-reducer mode also runs fused (fit-on-last + vmapped
    transform + silhouettes in ONE program) and must equal the separate
    embed_layers("shared") + batched_silhouettes stages."""
    from tdax.pipeline.tda_sweep import (batched_silhouettes,
                                         embed_and_silhouettes, embed_layers)
    rng = np.random.default_rng(12)
    clouds = rng.normal(size=(4, 18, 32))
    labels = {"shape": [f"s{i % 3}" for i in range(18)],
              "color": [f"c{i % 2}" for i in range(18)]}
    cfg = SweepConfig(reducer_mode="shared",
                      umap=UMAPConfig(n_neighbors=5, n_components=3,
                                      random_state=42, metric="cosine",
                                      n_epochs=60))
    sep_clouds = embed_layers(clouds, cfg).astype(np.float32)
    sep_sil = batched_silhouettes(sep_clouds, labels)
    fus_clouds, fus_sil = embed_and_silhouettes(clouds, cfg, labels)
    np.testing.assert_allclose(fus_clouds, sep_clouds, rtol=1e-5, atol=1e-5)
    for k in labels:
        np.testing.assert_allclose(fus_sil[k], sep_sil[k], rtol=1e-5, atol=1e-5)

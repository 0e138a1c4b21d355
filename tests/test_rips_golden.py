"""Golden regression: tdax Rips vs the reference's committed ripser outputs.

Runs persistence on the 32 committed UMAP clouds
(``tda-output/point_clouds_3d/layer_i_cloud.npy``) and diffs against
``tda-output/summary_stats.json`` — the strongest end-to-end
correctness gate available with zero model infrastructure
(SURVEY §4 "golden regression").
"""

import json

import numpy as np
import pytest

from tdax.ops.rips import rips

TOL = 1e-5  # BASELINE.json bottleneck-distance parity bar


@pytest.fixture(scope="module")
def golden(golden_tda_dir):
    with open(golden_tda_dir / "summary_stats.json") as f:
        return golden_tda_dir, json.load(f)


@pytest.mark.parametrize("backend", ["python", "native"])
def test_all_layers_match_ripser(golden, backend):
    if backend == "native":
        from tdax.ops.rips import native
        if not native.available():
            pytest.skip("native engine not built")
    tda_dir, entries = golden
    assert len(entries) == 32
    for entry in entries:
        i = entry["layer"]
        cloud = np.load(tda_dir / "point_clouds_3d" / f"layer_{i}_cloud.npy")
        dgms = rips(cloud, maxdim=1, backend=backend)["dgms"]
        h0, h1 = dgms
        h0_fin = h0[np.isfinite(h0[:, 1])]

        # n_h0_features counts infinite bars (debug_tda_pipeline.py:126)
        assert len(h0) - len(h0_fin) == entry["n_h0_features"], f"layer {i}"
        assert len(h1) == entry["n_h1_features"], f"layer {i}"
        assert abs(h0_fin[:, 1].max() - entry["max_h0_persistence"]) < TOL, f"layer {i}"

        ours = np.sort(h1[:, 1] - h1[:, 0])
        theirs = np.sort(np.array(entry["all_h1_persistence_values"]))
        np.testing.assert_allclose(ours, theirs, atol=TOL, err_msg=f"layer {i}")

"""tdax-own pinned regression goldens.

The reference's committed ``tda-output`` golden-gates the PH stage only
(tests/test_rips_golden.py); UMAP/silhouette/pipeline drift on the full
e2e path was invisible.  These tests run the complete toy-model
pipeline — dataset -> deterministic toy extraction -> main sweep, plus
the adversarial sweep on a subsampled pair set — under fixed seeds and
diff against goldens committed in tests/goldens/.

TPU f32 matmul rounding shifts the UMAP SGD trajectory, so the goldens
are pinned PER TRAJECTORY: tests/goldens/*.json gates the CPU CI path,
tests/goldens/*_tpu.json gates the on-hardware pass (TDAX_TEST_TPU=1) —
the full-pipeline drift gate runs on the hardware the framework targets,
not only on CPU.

Regenerate (after an INTENTIONAL numerics change, on the SAME
trajectory you are re-pinning):
    TDAX_REGEN_GOLDENS=1 [TDAX_TEST_TPU=1] \
        python -m pytest tests/test_golden_regression.py -q
then commit the updated tests/goldens/*.json with the reason.
"""

import json
import os

import numpy as np
import pytest

from tdax.config import DatasetConfig, ExtractConfig, SweepConfig
from tdax.data import generate_dataset
from tdax.data.adversarial import generate_adversarial_metadata
from tdax.models.qwen_vl import QwenVLConfig
from tdax.pipeline.extract import extract_activations

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
REGEN = os.environ.get("TDAX_REGEN_GOLDENS") == "1"
SUFFIX = "_tpu" if os.environ.get("TDAX_TEST_TPU") == "1" else ""
CFG = QwenVLConfig.tiny(dtype="float32")


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("golden_ds")
    cfg = DatasetConfig(data_dir=str(root / "data"))
    metadata = generate_dataset(cfg)
    return cfg, metadata


def _extract(metadata, out):
    return extract_activations(
        metadata, out, CFG,
        ExtractConfig(model_dir=None, batch_size=8, save_interval=1000),
        verbose=False)


def _check_or_regen(path, got):
    if REGEN:
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        with open(path, "w") as f:
            json.dump(got, f, indent=1, sort_keys=True)
        pytest.skip(f"regenerated {path}")
    assert os.path.exists(path), (
        f"golden {path} missing — run TDAX_REGEN_GOLDENS=1 once and commit it")
    with open(path) as f:
        want = json.load(f)

    def diff(a, b, key=""):
        assert type(a) is type(b) or (isinstance(a, (int, float))
                                      and isinstance(b, (int, float))), key
        if isinstance(a, dict):
            assert set(a) == set(b), (key, set(a) ^ set(b))
            for k in a:
                diff(a[k], b[k], f"{key}.{k}")
        elif isinstance(a, list):
            assert len(a) == len(b), (key, len(a), len(b))
            for i, (x, y) in enumerate(zip(a, b)):
                diff(x, y, f"{key}[{i}]")
        elif isinstance(a, float):
            # counts and layer indices are exact ints; float metrics get a
            # tolerance wide enough for BLAS/runtime variation, tight
            # enough to expose real algorithmic drift
            np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3,
                                       err_msg=key)
        else:
            assert a == b, (key, a, b)

    diff(got, want)


def _round(x, nd=4):
    if isinstance(x, dict):
        return {k: _round(v, nd) for k, v in x.items()}
    if isinstance(x, list):
        return [_round(v, nd) for v in x]
    if isinstance(x, float):
        return round(x, nd)
    return x


def test_main_sweep_golden(dataset, tmp_path):
    """Full toy e2e: the main sweep's summary stats are pinned."""
    from tdax.pipeline.tda_sweep import run_tda_sweep
    ds, metadata = dataset
    results = _extract(metadata, str(tmp_path / "acts.pt"))
    cfg = SweepConfig(output_dir=str(tmp_path / "out"))
    out = run_tda_sweep(results, os.path.join(ds.data_dir, "metadata.json"),
                        cfg, verbose=False)
    got = {
        "peak_layer": int(out["peak_layer"]),
        "stats": _round([{k: v for k, v in s.items()} for s in out["stats"]]),
    }
    _check_or_regen(os.path.join(GOLDEN_DIR,
                                 f"toy_sweep_golden{SUFFIX}.json"), got)


def test_adversarial_sweep_golden(dataset, tmp_path):
    """Adversarial 4-condition sweep on a 2-base-image subsample (40
    pairs): summary.json values pinned (closes the reference-side gap —
    it commits no adversarial goldens at all)."""
    from tdax.pipeline.adversarial import run_adversarial_sweep
    ds, metadata = dataset
    bound = [m for m in metadata if m["type"] == "bound"]
    adv = generate_adversarial_metadata(bound, ds, save=False)
    base_ids = {bound[0]["id"], bound[1]["id"]}
    adv = [m for m in adv if m["base_id"] in base_ids]
    assert len(adv) == 40  # 2 x (1 + 5 + 5 + 9)

    results = _extract(adv, str(tmp_path / "adv_acts.pt"))
    out_dir = str(tmp_path / "adv_out")
    run_adversarial_sweep(results, out_dir,
                          SweepConfig(output_dir=out_dir), verbose=False)
    with open(os.path.join(out_dir, "summary.json")) as f:
        summary = json.load(f)
    got = _round(summary)
    _check_or_regen(
        os.path.join(GOLDEN_DIR, f"toy_adversarial_golden{SUFFIX}.json"), got)

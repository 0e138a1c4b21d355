"""Data-layer tests: schema + golden diff against the committed metadata."""

import json

import numpy as np
import pytest
from PIL import Image

from tdax.config import DatasetConfig, NON_GREY_COLORS, SHAPES
from tdax.data import generate_dataset
from tdax.data.adversarial import condition_counts, generate_adversarial_metadata


@pytest.fixture(scope="module")
def generated(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    cfg = DatasetConfig(data_dir=str(root / "data/physics_experiment_6x6"))
    metadata = generate_dataset(cfg)
    return cfg, metadata


def test_counts_and_schema(generated):
    cfg, metadata = generated
    assert len(metadata) == 48
    types = [m["type"] for m in metadata]
    assert types.count("bound") == 36
    assert types.count("color_only") == 6
    assert types.count("shape_only") == 6
    for m in metadata:
        assert set(m) == {"id", "image_path", "prompt", "type", "color", "shape"}


def test_images_rendered(generated):
    cfg, metadata = generated
    img = Image.open(metadata[0]["image_path"])
    assert img.size == (200, 200)
    arr = np.asarray(img)
    # red cube: red pixels present, grey background present
    assert (arr[100, 100] == (255, 60, 60)).all()
    assert (arr[5, 5] == (128, 128, 128)).all()


def test_golden_metadata_matches_reference(generated, reference_dir):
    """Byte-level parity with the committed 48-entry metadata.json
    (paths are relative in both, so entries should be identical)."""
    cfg, metadata = generated
    with open(reference_dir / "data/physics_experiment_6x6/metadata.json") as f:
        golden = json.load(f)
    # Normalize image paths: ours are rooted in tmp dir.
    ours = [dict(m, image_path=m["image_path"].split("data/physics_experiment_6x6/")[-1])
            for m in metadata]
    theirs = [dict(m, image_path=m["image_path"].split("data/physics_experiment_6x6/")[-1])
              for m in golden]
    assert ours == theirs


def test_adversarial_counts(generated):
    cfg, metadata = generated
    samples = generate_adversarial_metadata(metadata, cfg, save=True)
    assert len(samples) == 720
    counts = condition_counts(samples)
    assert counts == {
        "matched": 36,
        "color_mismatch": 180,
        "shape_mismatch": 180,
        "both_mismatch": 324,
    }
    with open(cfg.adversarial_metadata_path) as f:
        saved = json.load(f)
    assert saved == samples
    for s in samples:
        assert s["color_match"] == (s["txt_color"] == s["img_color"])
        assert s["shape_match"] == (s["txt_shape"] == s["img_shape"])
        assert s["prompt"] == f"a photo of a {s['txt_color']} {s['txt_shape']}"


def test_adversarial_ids_unique(generated):
    cfg, metadata = generated
    samples = generate_adversarial_metadata(metadata, cfg, save=False)
    ids = [s["id"] for s in samples]
    assert len(set(ids)) == len(ids)


def test_adversarial_golden_matches_reference(generated, reference_dir):
    """Parity with the reference generator run on the same base metadata."""
    ref_path = reference_dir / "data/physics_experiment_6x6/adversarial_metadata.json"
    if not ref_path.exists():
        pytest.skip("reference has no committed adversarial metadata")
    cfg, metadata = generated
    samples = generate_adversarial_metadata(metadata, cfg, save=False)
    with open(ref_path) as f:
        golden = json.load(f)
    norm = lambda m: dict(m, image_path=m["image_path"].split("physics_experiment_6x6/")[-1])
    assert [norm(s) for s in samples] == [norm(g) for g in golden]

"""Extraction pipeline: toy-model end-to-end, schema, checkpoint/resume."""

import glob
import os
import unittest.mock

import numpy as np
import pytest

from tdax.config import DatasetConfig, ExtractConfig
from tdax.data import generate_dataset
from tdax.data.io import load_activations
from tdax.models.qwen_vl import QwenVLConfig
import tdax.pipeline.extract as extract_mod
from tdax.pipeline.extract import extract_activations

CFG = QwenVLConfig.tiny(dtype="float32")


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("extract_ds")
    cfg = DatasetConfig(data_dir=str(root / "data"))
    metadata = generate_dataset(cfg)  # rendered images (the ViT consumes them)
    return cfg, metadata[:12]  # subset for speed


def test_extract_end_to_end(dataset, tmp_path):
    ds, metadata = dataset
    out = str(tmp_path / "all_activations.pt")
    results = extract_activations(metadata, out, CFG,
                                  ExtractConfig(model_dir=None, batch_size=4,
                                                save_interval=100),
                                  verbose=False)
    assert len(results) == len(metadata)
    sid = metadata[0]["id"]
    vec = results[sid]["activations"]["layer_0"]
    assert vec.shape == (CFG.hidden_size,)
    assert np.isfinite(vec).all()

    # reference-compatible .pt + fast .npz siblings both load
    a = load_activations(out)
    b = load_activations(out.replace(".pt", ".npz"))
    assert set(a) == set(b) == {m["id"] for m in metadata}
    np.testing.assert_allclose(a[sid]["activations"]["layer_1"],
                               b[sid]["activations"]["layer_1"], rtol=1e-6)
    assert not os.path.exists(out + ".tmp")  # cleaned after success


def test_extract_deterministic_and_image_sensitive(dataset, tmp_path):
    ds, metadata = dataset
    kw = dict(cfg=CFG, extract_cfg=ExtractConfig(model_dir=None, batch_size=4,
                                                 save_interval=100),
              verbose=False)
    r1 = extract_activations(metadata[:4], str(tmp_path / "a.pt"), **kw)
    r2 = extract_activations(metadata[:4], str(tmp_path / "b.pt"), **kw)
    sid = metadata[0]["id"]
    np.testing.assert_array_equal(r1[sid]["activations"]["layer_2"],
                                  r2[sid]["activations"]["layer_2"])
    # different images with the same prompt structure give different activations
    other = metadata[1]["id"]
    assert not np.allclose(r1[sid]["activations"]["layer_2"],
                           r1[other]["activations"]["layer_2"])


def test_ragged_final_batch_single_compile(dataset, tmp_path):
    """A dataset size not divisible by batch_size must still compile the
    batched forward exactly once (tail padded to batch_size, padding
    sliced off) and produce per-sample results identical to a
    divisible-size run."""
    import tdax.pipeline.extract as ex
    ds, metadata = dataset
    kw = dict(cfg=CFG, extract_cfg=ExtractConfig(model_dir=None, batch_size=4,
                                                 save_interval=100),
              verbose=False)
    ragged = extract_activations(metadata[:10], str(tmp_path / "r.pt"), **kw)
    assert ex.LAST_TRACE_COUNT == 1
    assert len(ragged) == 10
    even = extract_activations(metadata[:12], str(tmp_path / "e.pt"), **kw)
    assert ex.LAST_TRACE_COUNT == 1
    for sid in list(ragged)[:10]:
        np.testing.assert_allclose(ragged[sid]["activations"]["layer_2"],
                                   even[sid]["activations"]["layer_2"],
                                   rtol=1e-6, atol=1e-7)


def test_checkpoint_resume(dataset, tmp_path):
    """The reference's crash-recovery contract: a .tmp checkpoint written
    mid-run is resumed by sample id and removed on success."""
    ds, metadata = dataset
    out = str(tmp_path / "resume.pt")
    ecfg = ExtractConfig(model_dir=None, batch_size=4, save_interval=4)

    # full run to produce ground truth
    full = extract_activations(metadata, str(tmp_path / "full.pt"), CFG, ecfg,
                               verbose=False)

    # simulate a crash: run only the first 8 samples, keep the .tmp
    extract_activations(metadata[:8], out, CFG, ecfg, verbose=False)
    # the partial run finished "successfully" for its 8 samples, so fake
    # the crash state by moving its npz to the EXACT tmp slot the
    # checkpoint writer uses (".tmp.npz" — np.savez appends ".npz")
    os.replace(out.replace(".pt", ".npz"), out + ".tmp.npz")
    os.remove(out)

    # resume over the full metadata: must skip the 8 done ids
    resumed = extract_activations(metadata, out, CFG, ecfg, verbose=False)
    assert set(resumed) == {m["id"] for m in metadata}
    for sid in resumed:
        np.testing.assert_allclose(resumed[sid]["activations"]["layer_3"],
                                   full[sid]["activations"]["layer_3"],
                                   rtol=1e-5, atol=1e-6)
    assert not glob.glob(out + ".tmp*")


def test_midrun_checkpoint_lands_on_resume_path(dataset, tmp_path):
    """The mid-run checkpoint must be written to the SAME path the resume
    logic checks (a .tmp/.tmp.npz mismatch once made resume a silent
    no-op and leaked the tmp file past the success cleanup)."""
    ds, metadata = dataset
    out = str(tmp_path / "mid.pt")
    ecfg = ExtractConfig(model_dir=None, batch_size=4, save_interval=4)

    seen = {}
    orig = extract_mod.save_activations_npz

    def spy(path, *a, **kw):
        orig(path, *a, **kw)
        seen[path] = os.path.exists(path)

    with unittest.mock.patch.object(extract_mod, "save_activations_npz", spy):
        extract_activations(metadata[:8], out, CFG, ecfg, verbose=False)
    tmp_writes = [p for p in seen if ".tmp" in p]
    assert tmp_writes, "no mid-run checkpoint was written"
    for p in tmp_writes:
        assert seen[p], f"checkpoint path {p} not on disk at write time"
    assert not glob.glob(out + ".tmp*")  # removed on success


def test_stale_checkpoint_from_other_run_discarded(dataset, tmp_path, capsys):
    """A leaked .tmp.npz whose sample ids don't belong to the current
    metadata (e.g. from a pre-fix run over a different dataset in the
    same output dir) must be discarded, not silently spliced in."""
    ds, metadata = dataset
    out = str(tmp_path / "stale.pt")
    ecfg = ExtractConfig(model_dir=None, batch_size=4, save_interval=100)

    # forge a checkpoint with foreign ids at the exact resume path
    foreign = [dict(m, id=m["id"] + "_other_run") for m in metadata[:4]]
    extract_activations(foreign, str(tmp_path / "foreign.pt"), CFG, ecfg,
                        verbose=False)
    os.replace(str(tmp_path / "foreign.npz"), out + ".tmp.npz")

    results = extract_activations(metadata[:8], out, CFG, ecfg, verbose=False)
    assert set(results) == {m["id"] for m in metadata[:8]}  # no foreign ids
    assert "stale checkpoint" in capsys.readouterr().out

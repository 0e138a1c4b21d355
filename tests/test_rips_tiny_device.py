"""Batched on-device tiny-cloud Rips (ops.rips.tiny_device) vs the
host engines: pairing must be identical (same total simplex order), so
diagrams match shape-exactly with f32-level value deviation only."""

import numpy as np
import pytest

from tdax.ops.rips import rips
from tdax.ops.rips.tiny_device import rips_tiny_batched, _tiny_h1_pairs


def _check_batch(clouds, atol=5e-5):
    dgms = rips_tiny_batched(clouds)
    for l in range(clouds.shape[0]):
        ref = rips(clouds[l].astype(np.float64), maxdim=1)["dgms"]
        for p in range(2):
            a, b = dgms[l][p], ref[p]
            assert a.shape == b.shape, (l, p, a.shape, b.shape)
            fin = np.isfinite(b)
            np.testing.assert_allclose(a[fin], b[fin], atol=atol)
            assert np.array_equal(np.isinf(a), np.isinf(b))


def test_random_clouds_match_engine():
    rng = np.random.default_rng(0)
    _check_batch(rng.normal(size=(6, 36, 3)).astype(np.float32))


def test_clustered_and_degenerate_geometries():
    rng = np.random.default_rng(42)
    centers = rng.normal(size=(6, 3)) * 3
    clustered = np.stack([centers[i // 6] + rng.normal(0, 0.05, 3)
                          for i in range(36)]).astype(np.float32)
    dup = clustered.copy()
    dup[1] = dup[0]  # exact duplicate point (zero-length edge)
    # integer grid: massive diameter ties — exercises the colex
    # tie-breaking that the pairing depends on
    grid = np.stack(np.meshgrid(np.arange(6.0), np.arange(6.0), [0.0]),
                    -1).reshape(-1, 3)[:36].astype(np.float32)
    _check_batch(np.stack([clustered, dup, grid]))


def test_small_n_and_circle():
    rng = np.random.default_rng(1)
    theta = np.linspace(0, 2 * np.pi, 13)[:12]
    circle = np.stack([np.cos(theta), np.sin(theta),
                       np.zeros_like(theta)], 1).astype(np.float32)
    circle += rng.normal(0, 0.01, circle.shape).astype(np.float32)
    batch = np.stack([circle, rng.normal(size=(12, 3)).astype(np.float32)])
    dgms = rips_tiny_batched(batch)
    # a noisy circle has one dominant H1 bar
    h1 = dgms[0][1]
    pers = h1[:, 1] - h1[:, 0]
    assert pers.max() > 3 * (np.sort(pers)[-2] if len(pers) > 1 else 0.01)
    _check_batch(batch)


def test_maxdim2_matches_engine():
    """On-device H2 (tet-by-triangle reduction) vs the host engine:
    shape-exact pairing, f32-level values — incl. a sphere with a real
    H2 bar and a duplicate-point degenerate cloud."""
    rng = np.random.default_rng(0)
    theta = np.arccos(1 - 2 * rng.random(18))
    phi = 2 * np.pi * rng.random(18)
    sphere = np.stack([np.sin(theta) * np.cos(phi),
                       np.sin(theta) * np.sin(phi),
                       np.cos(theta)], 1).astype(np.float32)
    rand = rng.normal(size=(18, 3)).astype(np.float32)
    dup = rand.copy()
    dup[1] = dup[0]
    batch = np.stack([sphere, rand, dup])
    dgms = rips_tiny_batched(batch, maxdim=2)
    found_h2 = False
    for l in range(batch.shape[0]):
        ref = rips(batch[l].astype(np.float64), maxdim=2)["dgms"]
        for p in range(3):
            a, b = dgms[l][p], ref[p]
            assert a.shape == b.shape, (l, p, a.shape, b.shape)
            fin = np.isfinite(b)
            np.testing.assert_allclose(a[fin], b[fin], atol=5e-5)
        found_h2 = found_h2 or len(dgms[l][2]) > 0
    assert found_h2, "expected at least one H2 bar (sphere cloud)"


def test_maxdim2_chunking_pads_tail(monkeypatch):
    """H2 batch chunking (chunk=2 over 3 clouds pads the tail) must not
    change any diagram vs the unchunked program."""
    rng = np.random.default_rng(5)
    batch = rng.normal(size=(3, 14, 3)).astype(np.float32)
    full = rips_tiny_batched(batch, maxdim=2)
    monkeypatch.setenv("TDAX_TINY_H2_CHUNK", "2")
    chunked = rips_tiny_batched(batch, maxdim=2)
    for a_l, b_l in zip(chunked, full):
        for a, b in zip(a_l, b_l):
            np.testing.assert_array_equal(a, b)


def test_convergence_reported():
    rng = np.random.default_rng(2)
    clouds = rng.normal(size=(2, 20, 3)).astype(np.float32)
    import jax.numpy as jnp
    *_, converged, sweeps = _tiny_h1_pairs(jnp.asarray(clouds), 20)
    assert bool(converged)
    assert 0 < int(sweeps) < 500


def test_golden_clouds_counts_exact(golden_tda_dir):
    """The committed reference clouds: feature counts must be exact and
    max persistence within the 1e-5 golden bar (ripser parity —
    BASELINE.json metric)."""
    import glob
    import json
    import re
    files = sorted(
        glob.glob(str(golden_tda_dir / "point_clouds_3d" / "layer_*_cloud.npy")),
        key=lambda p: int(re.search(r"layer_(\d+)", p).group(1)))
    clouds = np.stack([np.load(f) for f in files])
    stats = json.load(open(golden_tda_dir / "summary_stats.json"))
    dgms = rips_tiny_batched(clouds)
    for l, s in enumerate(stats):
        h1 = dgms[l][1]
        assert len(h1) == s["n_h1_features"]
        mp = float((h1[:, 1] - h1[:, 0]).max()) if len(h1) else 0.0
        assert abs(mp - s["max_h1_persistence"]) < 1e-4
        h0 = dgms[l][0]
        assert int(np.sum(np.isinf(h0[:, 1]))) == s["n_h0_features"]


def test_sweep_dispatch_uses_device_path(monkeypatch):
    """persistence_per_layer auto-selects the batched device path for
    tiny maxdim-1 batches and must agree with the forced host path."""
    from tdax.pipeline import tda_sweep
    rng = np.random.default_rng(3)
    clouds = rng.normal(size=(4, 30, 3)).astype(np.float32)

    dev = tda_sweep.persistence_per_layer(clouds, maxdim=1, backend="device")
    monkeypatch.setenv("TDAX_NO_DEVICE_PH", "1")
    host = tda_sweep.persistence_per_layer(clouds, maxdim=1, backend="auto")
    for a_l, b_l in zip(dev, host):
        for a, b in zip(a_l, b_l):
            assert a.shape == b.shape
            fin = np.isfinite(b)
            np.testing.assert_allclose(a[fin], b[fin], atol=5e-5)

"""Metrics: silhouette vs sklearn, bottleneck properties, geometry ports
vs the reference TorchScript originals (imported as oracle when present)."""

import importlib.util

import numpy as np
import pytest

from tdax.metrics import (bottleneck_distance, compute_accuracy_by_example,
                          compute_effective_dimensionality,
                          compute_fixed_window_ed,
                          compute_fixed_window_id,
                          compute_intrinsic_dimensionality, diagram_stats,
                          get_persistence, matrix_entropy, silhouette_score)


@pytest.fixture(scope="module")
def ref_metrics(reference_dir):
    """Load the reference metrics.py as a test oracle (torch CPU)."""
    path = reference_dir / "metrics.py"
    if not path.exists():
        pytest.skip("reference metrics.py unavailable")
    spec = importlib.util.spec_from_file_location("ref_metrics", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# --- silhouette ---------------------------------------------------------------

@pytest.mark.parametrize("seed", [0, 1, 2])
def test_silhouette_matches_sklearn(seed):
    from sklearn.metrics import silhouette_score as skl
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(36, 3))
    labels = np.array([f"c{i % 6}" for i in range(36)])
    assert silhouette_score(x, labels) == pytest.approx(skl(x, labels), abs=1e-5)


def test_silhouette_singleton_cluster():
    from sklearn.metrics import silhouette_score as skl
    rng = np.random.default_rng(3)
    x = rng.normal(size=(10, 3))
    labels = np.array(["a"] * 9 + ["b"])  # singleton cluster -> s=0 convention
    assert silhouette_score(x, labels) == pytest.approx(skl(x, labels), abs=1e-5)


# --- persistence summaries ------------------------------------------------------

def test_get_persistence_matches_reference_semantics():
    dgm = np.array([[0.0, 1.0], [0.5, np.inf], [0.2, 0.9]])
    pers, mx = get_persistence(dgm)
    np.testing.assert_allclose(sorted(pers), [0.7, 1.0])
    assert mx == pytest.approx(1.0)
    pers, mx = get_persistence(np.zeros((0, 2)))
    assert len(pers) == 0 and mx == 0.0


def test_diagram_stats_schema():
    dgms = [np.array([[0, 1.0], [0, np.inf]]), np.array([[0.5, 1.5]])]
    s = diagram_stats(dgms, layer=3)
    assert s == {
        "layer": 3, "n_h1_features": 1, "max_h1_persistence": 1.0,
        "all_h1_persistence_values": [1.0], "n_h0_features": 1,
        "max_h0_persistence": 1.0,
    }


# --- bottleneck ----------------------------------------------------------------

def test_bottleneck_identity_and_symmetry():
    rng = np.random.default_rng(0)
    b = rng.uniform(0, 1, (8, 1))
    d = np.concatenate([b, b + rng.uniform(0.1, 1, (8, 1))], axis=1)
    assert bottleneck_distance(d, d) == 0.0
    d2 = d + rng.uniform(-0.01, 0.01, d.shape)
    assert bottleneck_distance(d, d2) == pytest.approx(bottleneck_distance(d2, d))


def test_bottleneck_perturbation_bound():
    rng = np.random.default_rng(1)
    b = rng.uniform(0, 1, (6, 1))
    d = np.concatenate([b, b + rng.uniform(0.5, 1, (6, 1))], axis=1)
    eps = 0.01
    d2 = d + rng.uniform(-eps, eps, d.shape)
    assert bottleneck_distance(d, d2) <= eps + 1e-12


def test_bottleneck_diagonal_matching():
    # a single low-persistence point matches the diagonal at pers/2
    d1 = np.array([[0.0, 1.0]])
    d2 = np.array([[0.0, 1.0], [0.4, 0.5]])
    assert bottleneck_distance(d1, d2) == pytest.approx(0.05)


def test_bottleneck_infinite_bars():
    d1 = np.array([[0.0, np.inf], [0, 1]])
    d2 = np.array([[0.2, np.inf], [0, 1]])
    assert bottleneck_distance(d1, d2) == pytest.approx(0.2)
    d3 = np.array([[0.0, 1.0]])
    assert bottleneck_distance(d1, d3) == np.inf


def _random_diagram(rng, n, spread=1.0):
    b = rng.uniform(0, 1, (n, 1))
    return np.concatenate([b, b + rng.exponential(spread, (n, 1))], axis=1)


def test_bottleneck_sparse_matches_exact():
    """The grid-hashed feasibility path (bottleneck_distance_sparse)
    returns the SAME exactly-realized cost as the dense augmented-matrix
    path, across diagram shapes: perturbed twins, unequal counts,
    diagonal-dominant noise, disjoint clouds, and infinite bars."""
    from tdax.metrics.persistence import bottleneck_distance_sparse

    rng = np.random.default_rng(7)
    cases = []
    d = _random_diagram(rng, 60)
    cases.append((d, d + rng.uniform(-0.01, 0.01, d.shape)))   # twins
    cases.append((d, _random_diagram(rng, 45)))                # unequal n
    noisy = np.concatenate([d, _random_diagram(rng, 200, 0.005)])
    cases.append((noisy, d))                                   # diag noise
    cases.append((_random_diagram(rng, 30) + 5.0,
                  _random_diagram(rng, 30)))                   # disjoint
    cases.append((np.zeros((0, 2)), _random_diagram(rng, 12)))  # empty side
    inf_a = np.concatenate([d[:20], [[0.1, np.inf], [0.6, np.inf]]])
    inf_b = np.concatenate([d[:20] * 1.001, [[0.12, np.inf], [0.58, np.inf]]])
    cases.append((inf_a, inf_b))                               # paired infs
    for a, b in cases:
        want = bottleneck_distance(a, b)
        got = bottleneck_distance_sparse(a, b)
        assert got == pytest.approx(want, rel=1e-9, abs=1e-12), (want, got)
        assert bottleneck_distance_sparse(b, a) == pytest.approx(
            got, rel=1e-9, abs=1e-12)


def test_bottleneck_sparse_mismatched_infs():
    from tdax.metrics.persistence import bottleneck_distance_sparse

    assert bottleneck_distance_sparse(
        np.array([[0.0, np.inf]]), np.array([[0.0, 1.0]])) == np.inf


def test_bottleneck_large_dispatch_and_scale():
    """10k-bar diagrams (the scale path's regime, README.md:127-128):
    the automatic dispatch to the sparse path returns the perturbation
    bound's answer in seconds, where the dense path would build a
    ~4e8-entry matrix."""
    import time

    rng = np.random.default_rng(11)
    d = _random_diagram(rng, 10_000, 0.2)
    shift = np.full_like(d, 1e-4)
    t0 = time.time()
    got = bottleneck_distance(d, d + shift)  # Linf shift of exactly 1e-4
    dt = time.time() - t0
    # the shift bounds it above; cheaper cross-matchings can realize a
    # smaller exact value in dense regions (births spaced ~1e-4 apart)
    assert 0 < got <= 1e-4 * (1 + 1e-9), got
    assert dt < 60, f"sparse bottleneck too slow: {dt:.1f}s"


# --- geometry metric ports vs torch originals ------------------------------------

def test_effective_dimensionality_vs_reference(ref_metrics):
    import torch
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 20, 32)).astype(np.float32)
    ours = np.asarray(compute_effective_dimensionality(x))
    theirs = ref_metrics.compute_effective_dimensionality(torch.tensor(x)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4)


def test_effective_dimensionality_uniform_spectrum():
    # orthonormal rows -> all singular values equal -> normalized ED = 1
    x = np.eye(16, 32)[None].astype(np.float32)
    assert float(compute_effective_dimensionality(x)[0]) == pytest.approx(1.0, abs=1e-5)


@pytest.mark.parametrize("n_windows", [1, 3, 4, 50])
def test_fixed_window_ed_vs_reference(ref_metrics, n_windows):
    import torch
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 40, 16)).astype(np.float32)
    ours = np.asarray(compute_fixed_window_ed(x, n_windows))
    theirs = ref_metrics.compute_fixed_window_ed(torch.tensor(x), n_windows).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4)


def test_intrinsic_dimensionality_vs_reference(ref_metrics):
    import torch
    rng = np.random.default_rng(2)
    # data on a ~5-d manifold embedded in 32-d
    z = rng.normal(size=(3, 200, 5))
    emb = rng.normal(size=(5, 32))
    x = (z @ emb + rng.normal(0, 1e-3, (3, 200, 32))).astype(np.float32)
    ours = np.asarray(compute_intrinsic_dimensionality(x))
    theirs = ref_metrics.compute_intrinsic_dimensionality(torch.tensor(x)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-3)
    assert 3.0 < ours[0] < 8.0  # sane TwoNN estimate for a 5-d manifold


def test_intrinsic_dimensionality_too_few_samples():
    x = np.zeros((2, 4, 8), dtype=np.float32)
    assert np.isnan(np.asarray(compute_intrinsic_dimensionality(x))).all()


@pytest.mark.parametrize("n_windows", [2, 5])
def test_fixed_window_id_vs_reference(ref_metrics, n_windows):
    import torch
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 60, 16)).astype(np.float32)
    ours = np.asarray(compute_fixed_window_id(x, n_windows))
    theirs = ref_metrics.compute_fixed_window_id(torch.tensor(x), n_windows).numpy()
    both_nan = np.isnan(ours) & np.isnan(theirs)
    np.testing.assert_allclose(np.where(both_nan, 0, ours),
                               np.where(both_nan, 0, theirs), rtol=1e-3)


@pytest.mark.parametrize("mode", ["all", "first_token", "token_wise"])
def test_accuracy_by_example_vs_reference(ref_metrics, mode):
    import torch
    rng = np.random.default_rng(4)
    gt = rng.integers(0, 10, (3, 12))
    pred = gt.copy()
    pred[0, 3] = (pred[0, 3] + 1) % 10
    labels = np.array([["pad", "ex1_answer", "ex1_answer", "ex1_answer",
                        "x", "ex2_answer", "ex2_answer", "pad",
                        "ex3_answer", "pad", "pad", "pad"]] * 3)
    ours = compute_accuracy_by_example(gt, pred, labels, mode)
    theirs = ref_metrics.compute_accuracy_by_example(
        torch.tensor(gt), torch.tensor(pred), labels, mode).numpy()
    np.testing.assert_allclose(ours, theirs, equal_nan=True)


@pytest.mark.parametrize("alpha", [1.0, 2.0, 0.5])
def test_matrix_entropy_vs_reference(ref_metrics, alpha):
    import torch
    rng = np.random.default_rng(5)
    x = rng.normal(size=(3, 12, 24)).astype(np.float32)
    ours = np.asarray(matrix_entropy(x, alpha))
    theirs = ref_metrics.matrix_entropy(torch.tensor(x), alpha).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-5)


def test_matrix_entropy_uniform():
    # orthogonal rows -> uniform spectrum -> Shannon entropy = log(N)
    x = np.eye(8, 16)[None].astype(np.float32)
    assert float(matrix_entropy(x)[0]) == pytest.approx(np.log(8), abs=1e-4)


def test_wasserstein_properties():
    from tdax.metrics import wasserstein_distance
    rng = np.random.default_rng(0)
    b = rng.uniform(0, 1, (6, 1))
    d = np.concatenate([b, b + rng.uniform(0.2, 1, (6, 1))], axis=1)
    assert wasserstein_distance(d, d) == 0.0
    d2 = d + 0.01
    # W1 of a uniform +0.01 shift on 6 points = 6 * 0.01
    assert wasserstein_distance(d, d2) == pytest.approx(0.06, abs=1e-9)
    # symmetric
    assert wasserstein_distance(d, d2) == pytest.approx(wasserstein_distance(d2, d))
    # diagonal matching: a tiny extra point costs pers/2
    d3 = np.concatenate([d, [[0.4, 0.5]]])
    assert wasserstein_distance(d, d3) == pytest.approx(0.05)
    # W_inf-like consistency: W1 >= bottleneck
    assert wasserstein_distance(d, d2) >= bottleneck_distance(d, d2) - 1e-12
    # infinite bars
    di = np.concatenate([d, [[0.1, np.inf]]])
    assert wasserstein_distance(d, di) == np.inf


def test_root_metrics_shim_matches_package():
    """`from metrics import ...` (the reference's import surface,
    /root/reference/metrics.py:5-398) resolves to the tdax ports."""
    import metrics as shim
    from tdax.metrics import geometry
    for name in shim.__all__:
        assert getattr(shim, name) is getattr(geometry, name), name

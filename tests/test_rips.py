"""Rips persistence: known-answer topology tests + backend cross-checks."""

import numpy as np
import pytest

from tdax.ops.rips import rips, rips_from_distances
from tdax.ops.rips.reference import enclosing_radius, rips_reference

SQUARE = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=float)


def finite(dgm):
    return dgm[np.isfinite(dgm[:, 1])]


def test_square():
    dgms = rips(SQUARE, maxdim=1)["dgms"]
    h0, h1 = dgms
    assert len(h0) == 4 and np.isinf(h0[:, 1]).sum() == 1
    np.testing.assert_allclose(finite(h0)[:, 1], [1, 1, 1], rtol=1e-6)
    np.testing.assert_allclose(h1, [[1.0, np.sqrt(2)]], rtol=1e-6)


def test_hexagon():
    t = np.linspace(0, 2 * np.pi, 7)[:-1]
    hexa = np.stack([np.cos(t), np.sin(t)], 1)
    h1 = rips(hexa, maxdim=1)["dgms"][1]
    np.testing.assert_allclose(h1, [[1.0, np.sqrt(3)]], rtol=1e-5)


def test_threshold_essential():
    dgms = rips(SQUARE, maxdim=1, thresh=1.2)["dgms"]
    h1 = dgms[1]
    assert len(h1) == 1 and h1[0, 0] == pytest.approx(1.0) and np.isinf(h1[0, 1])


def test_two_components_threshold():
    x = np.array([[0, 0], [1, 0], [10, 0], [11, 0]], dtype=float)
    h0 = rips(x, maxdim=0, thresh=2.0)["dgms"][0]
    assert np.isinf(h0[:, 1]).sum() == 2  # two components never merge


def test_circle_h1():
    rng = np.random.default_rng(0)
    t = rng.uniform(0, 2 * np.pi, 24)
    x = np.stack([np.cos(t), np.sin(t)], 1) + rng.normal(0, 0.05, (24, 2))
    h1 = rips(x, maxdim=1)["dgms"][1]
    pers = h1[:, 1] - h1[:, 0]
    assert pers.max() > 0.8  # one dominant loop
    assert (pers > 0.5).sum() == 1


def test_sphere_h2():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(40, 3))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    dgms = rips(x, maxdim=2)["dgms"]
    h2 = dgms[2]
    pers = h2[:, 1] - h2[:, 0]
    assert pers.max() > 0.1  # the 2-sphere void
    # H1 has no comparably persistent feature
    h1p = dgms[1][:, 1] - dgms[1][:, 0]
    assert h1p.max() < pers.max()


def test_enclosing_radius_equals_full_filtration():
    """The enclosing-radius shortcut must not change any diagram."""
    rng = np.random.default_rng(2)
    x = rng.normal(size=(15, 3))
    from tdax.ops.distances import pairwise_euclidean_np
    dist = pairwise_euclidean_np(x)
    r = enclosing_radius(dist)
    auto = rips_reference(dist, maxdim=2, thresh=np.inf)
    # full filtration: threshold far above any distance
    full = rips_reference(dist, maxdim=2, thresh=float(dist.max() * 2))
    for p in range(3):
        a = auto[p]
        f = full[p]
        # deaths beyond r cannot exist; essential sets must agree
        fin_a, fin_f = finite(a), finite(f)
        np.testing.assert_allclose(np.sort(fin_a, axis=0), np.sort(fin_f, axis=0),
                                   rtol=1e-9, atol=1e-12)
        assert np.isinf(a[:, 1]).sum() == np.isinf(f[:, 1]).sum()
        if len(fin_a):
            assert fin_a[:, 1].max() <= r + 1e-12


def test_duplicate_points():
    x = np.array([[0, 0], [0, 0], [1, 0]], dtype=float)
    dgms = rips(x, maxdim=1)["dgms"]
    h0 = dgms[0]
    # duplicate merges at 0 (no bar emitted), single finite bar at 1
    assert np.isinf(h0[:, 1]).sum() == 1
    np.testing.assert_allclose(finite(h0)[:, 1], [1.0])


def test_distance_matrix_entry():
    from tdax.ops.distances import pairwise_euclidean_np
    d = pairwise_euclidean_np(SQUARE)
    out = rips_from_distances(d, maxdim=1)["dgms"]
    np.testing.assert_allclose(out[1], [[1.0, np.sqrt(2)]], rtol=1e-9)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("maxdim", [1, 2])
def test_native_matches_python(seed, maxdim):
    from tdax.ops.rips import native
    if not native.available():
        pytest.skip("native engine not built")
    rng = np.random.default_rng(seed)
    n = 24 if maxdim == 2 else 40
    x = rng.normal(size=(n, 3))
    from tdax.ops.distances import pairwise_euclidean_np
    dist = pairwise_euclidean_np(x)
    py = rips_reference(dist, maxdim=maxdim)
    nat = native.rips_native(dist, maxdim=maxdim)
    for p in range(maxdim + 1):
        a, b = py[p], nat[p]
        assert a.shape == b.shape, f"dim {p}: {a.shape} vs {b.shape}"
        fa, fb = finite(a), finite(b)
        np.testing.assert_allclose(np.sort(fa, axis=0), np.sort(fb, axis=0),
                                   rtol=1e-9, atol=1e-12, err_msg=f"dim {p}")


@pytest.mark.parametrize("thresh", [0.8, 1.5, np.inf])
def test_native_matches_python_threshold(thresh):
    from tdax.ops.rips import native
    if not native.available():
        pytest.skip("native engine not built")
    rng = np.random.default_rng(7)
    x = rng.normal(size=(30, 2))
    from tdax.ops.distances import pairwise_euclidean_np
    dist = pairwise_euclidean_np(x)
    py = rips_reference(dist, maxdim=2, thresh=thresh)
    nat = native.rips_native(dist, maxdim=2, thresh=thresh)
    for p in range(3):
        assert py[p].shape == nat[p].shape, f"dim {p}"
        np.testing.assert_allclose(np.sort(py[p], axis=0), np.sort(nat[p], axis=0),
                                   rtol=1e-9, atol=1e-12)


def test_maxdim_above_native_cap_routes_to_python():
    """Native engine caps at maxdim 3 (fixed vertex buffers); auto backend
    must fall back to python instead of corrupting memory."""
    rng = np.random.default_rng(9)
    x = rng.normal(size=(8, 3))
    dgms = rips(x, maxdim=4, backend="auto")["dgms"]
    assert len(dgms) == 5
    from tdax.ops.rips import native
    if native.available():
        from tdax.ops.distances import pairwise_euclidean_np
        with pytest.raises(ValueError):
            native.rips_native(pairwise_euclidean_np(x), maxdim=4)

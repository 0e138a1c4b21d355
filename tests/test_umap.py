"""UMAP: stage-level exactness + structural quality of embeddings."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tdax.ops.umap import UMAP, fit_transform_batched
from tdax.ops.umap.fuzzy import fuzzy_simplicial_set, knn, pairwise, smooth_knn_dist
from tdax.ops.umap.spectral import spectral_init
from tdax.ops.umap.umap import find_ab_params
from tdax.config import UMAPConfig


@pytest.fixture(scope="module")
def clusters():
    rng = np.random.default_rng(0)
    centers = rng.normal(size=(6, 50)) * 5
    x = np.concatenate([c + rng.normal(0, 0.3, (6, 50)) for c in centers])
    labels = np.repeat(np.arange(6), 6)
    return x.astype(np.float32), labels


def test_find_ab_params_matches_umap_learn():
    # umap-learn's published values for (spread=1, min_dist=0.1)
    a, b = find_ab_params(1.0, 0.1)
    assert a == pytest.approx(1.577, abs=0.01)
    assert b == pytest.approx(0.8951, abs=0.01)


def test_knn_exact_vs_sklearn(clusters):
    x, _ = clusters
    d = pairwise(jnp.asarray(x), "cosine")
    idx, dists = knn(d, 6)
    from sklearn.neighbors import NearestNeighbors
    nn = NearestNeighbors(n_neighbors=6, metric="cosine").fit(x)
    skl_d, skl_i = nn.kneighbors(x)
    # same neighbor distances (indices can tie-swap)
    np.testing.assert_allclose(np.asarray(dists), skl_d, atol=1e-5)
    assert (np.asarray(idx)[:, 0] == np.arange(len(x))).all()  # self first


def test_smooth_knn_hits_entropy_target(clusters):
    x, _ = clusters
    d = pairwise(jnp.asarray(x), "cosine")
    _, dists = knn(d, 6)
    sigma, rho = smooth_knn_dist(dists, 6.0)
    # binary search target: sum of memberships = log2(k)
    d_adj = np.asarray(dists)[:, 1:] - np.asarray(rho)[:, None]
    psum = np.where(d_adj > 0, np.exp(-d_adj / np.asarray(sigma)[:, None]), 1.0).sum(1)
    np.testing.assert_allclose(psum, np.log2(6.0), atol=1e-3)
    assert (np.asarray(rho) >= 0).all()


def test_fuzzy_graph_symmetric(clusters):
    x, _ = clusters
    w, _, _ = fuzzy_simplicial_set(jnp.asarray(x), 6, "cosine")
    w = np.asarray(w)
    np.testing.assert_allclose(w, w.T, atol=1e-6)
    assert (np.diag(w) == 0).all()
    assert w.max() <= 1.0 + 1e-6 and w.min() >= 0.0


def test_spectral_init_scale(clusters):
    x, _ = clusters
    w, _, _ = fuzzy_simplicial_set(jnp.asarray(x), 6, "cosine")
    emb = spectral_init(w, 3, jax.random.PRNGKey(0))
    assert emb.shape == (36, 3)
    assert 9.0 < float(jnp.max(jnp.abs(emb))) < 10.1  # scaled to ~10 + jitter


def test_embedding_separates_clusters(clusters):
    x, labels = clusters
    emb = UMAP(n_neighbors=6, n_components=3, random_state=42,
               metric="cosine").fit_transform(x)
    from sklearn.metrics import silhouette_score
    assert silhouette_score(emb, labels) > 0.5
    assert np.isfinite(emb).all()


def test_embedding_preserves_circle():
    rng = np.random.default_rng(1)
    t = np.linspace(0, 2 * np.pi, 36, endpoint=False)
    x = np.stack([np.cos(t), np.sin(t)], 1) @ rng.normal(size=(2, 20))
    x += rng.normal(0, 0.01, x.shape)
    emb = UMAP(n_neighbors=6, n_components=3, random_state=42,
               metric="euclidean").fit_transform(x)
    from tdax.ops.rips import rips
    h1 = rips(np.asarray(emb, np.float64), maxdim=1)["dgms"][1]
    pers = h1[:, 1] - h1[:, 0]
    assert len(pers) >= 1 and pers.max() > 0.3  # the loop survives embedding


def test_deterministic(clusters):
    x, _ = clusters
    e1 = UMAP(n_neighbors=6, n_components=3, random_state=42, metric="cosine").fit_transform(x)
    e2 = UMAP(n_neighbors=6, n_components=3, random_state=42, metric="cosine").fit_transform(x)
    np.testing.assert_array_equal(e1, e2)
    e3 = UMAP(n_neighbors=6, n_components=3, random_state=7, metric="cosine").fit_transform(x)
    assert not np.allclose(e1, e3)


def test_batched_matches_single(clusters):
    if jax.devices()[0].platform == "tpu":
        pytest.skip("vmapped vs single programs fuse differently on TPU; "
                    "500 chaotic SGD epochs amplify the ulps (CPU asserts equality)")
    x, _ = clusters
    clouds = np.stack([x, x[::-1].copy()])
    cfg = UMAPConfig(n_neighbors=6, n_components=3, random_state=42, metric="cosine")
    batched = fit_transform_batched(clouds, cfg)
    single0 = UMAP.from_config(cfg).fit_transform(clouds[0])
    np.testing.assert_allclose(batched[0], single0, atol=1e-4)
    assert batched.shape == (2, 36, 3)


def test_shared_batched_matches_serial_loop(clusters):
    """shared_transform_batched (ONE vmapped fit-on-last + transform-all
    program) must match the serial UMAP.fit + per-layer transform loop —
    the legacy same-camera mode's batching must not change values."""
    if jax.devices()[0].platform == "tpu":
        pytest.skip("vmapped vs single programs fuse differently on TPU "
                    "(CPU asserts equality)")
    from tdax.ops.umap import shared_transform_batched
    x, _ = clusters
    rng = np.random.default_rng(3)
    clouds = np.stack([x + 0.05 * rng.normal(size=x.shape).astype(np.float32)
                       for _ in range(3)])
    cfg = UMAPConfig(n_neighbors=6, n_components=3, random_state=42,
                     metric="cosine", n_epochs=90)
    batched = shared_transform_batched(clouds, cfg)

    reducer = UMAP.from_config(cfg)
    reducer.n_neighbors = min(cfg.n_neighbors, clouds.shape[1] - 1)
    reducer.fit(clouds[-1])
    serial = np.stack([reducer.transform(clouds[i]) for i in range(3)])
    np.testing.assert_allclose(batched, serial, atol=1e-4)
    assert batched.shape == (3, 36, 3)


def test_transform_mode(clusters):
    """Shared-reducer mode (analyze_tda_over_layers.py:65-72): fit on one
    cloud, transform another; new points land near their neighbors."""
    x, labels = clusters
    u = UMAP(n_neighbors=6, n_components=3, random_state=42, metric="cosine")
    u.fit(x)
    # transform the training data itself: should land near the fitted embedding
    t = u.transform(x)
    d = np.linalg.norm(t - u.embedding_, axis=1)
    spread = np.abs(u.embedding_).max()
    assert np.median(d) < spread * 0.5
    # cluster structure retained under transform
    from sklearn.metrics import silhouette_score
    assert silhouette_score(t, labels) > 0.3


def test_smooth_knn_rho_with_duplicates():
    """A point with a single nonzero kNN distance gets rho = that distance
    (umap-learn behavior), not NaN->0 from 0*inf interpolation."""
    from tdax.ops.umap.fuzzy import smooth_knn_dist
    d = jnp.asarray(np.array([[0.0, 0.0, 0.0, 0.7],
                              [0.0, 0.2, 0.3, 0.4]], np.float32))
    sigma, rho = smooth_knn_dist(d, 4.0, local_connectivity=1.0)
    assert float(rho[0]) == pytest.approx(0.7)
    assert float(rho[1]) == pytest.approx(0.2)
    assert np.isfinite(np.asarray(sigma)).all()


def test_mean_field_repulsion_is_exact_expectation():
    """The dense layout's mean-field repulsion (layout._epoch_forces) must
    equal the EXACT expectation of umap's per-edge negative sampling —
    each active edge (i, j) owes n_neg[i, j] draws uniform over the nt
    tails; a draw equal to the HEAD vertex i at zero distance is skipped
    (umap-learn's ``elif j == k: continue``, j being the head), any
    other zero-distance draw applies the +4-per-dimension kick.  Oracle:
    direct enumeration over all (edge, draw) pairs in numpy, including
    duplicate-point geometry so both zero-distance branches fire."""
    from tdax.ops.umap.layout import _epoch_forces

    rng = np.random.default_rng(0)
    nh = nt = 7
    d = 3
    emb = rng.normal(size=(nh, d)).astype(np.float32)
    emb[4] = emb[1]          # duplicate pair -> d2 == 0 off-diagonal
    active = rng.random((nh, nt)) < 0.5
    np.fill_diagonal(active, False)
    n_neg = np.where(active, rng.integers(0, 6, (nh, nt)), 0).astype(np.float32)
    a, b, gamma = 1.58, 0.9, 1.0

    def clip(v):
        return np.clip(v, -4.0, 4.0)

    head_f = np.zeros((nh, d))
    head_c = np.zeros(nh)
    tail_f = np.zeros((nt, d))
    tail_c = np.zeros(nt)
    for i in range(nh):
        for j in range(nt):
            diff = (emb[i] - emb[j]).astype(np.float64)
            d2 = float(diff @ diff)
            if active[i, j]:
                pd2b = max(d2, 1e-12) ** b
                coeff = (-2.0 * a * b * pd2b / max(d2, 1e-12)) / (a * pd2b + 1.0) \
                    if d2 > 0 else 0.0
                g = clip(coeff * diff)
                head_f[i] += g
                tail_f[j] -= g
                head_c[i] += 1
                tail_c[j] += 1
            # expectation of n_neg[i, j] uniform draws over the tails
            if n_neg[i, j] > 0:
                for k in range(nt):
                    kdiff = (emb[i] - emb[k]).astype(np.float64)
                    kd2 = float(kdiff @ kdiff)
                    if kd2 <= 0.0 and k == i:
                        continue                     # umap's self-draw skip
                    if kd2 <= 0.0:
                        term = np.full(d, 4.0)       # umap's +4 kick
                    else:
                        pk = max(kd2, 1e-12) ** b
                        rc = (2.0 * gamma * b) / ((0.001 + kd2) * (a * pk + 1.0))
                        term = clip(rc * kdiff)
                    head_f[i] += n_neg[i, j] / nt * term
                    head_c[i] += n_neg[i, j] / nt

    hf, hc, tf, tc = _epoch_forces(jnp.asarray(emb), jnp.asarray(emb),
                                   jnp.asarray(active), jnp.asarray(n_neg),
                                   jnp.float32(a), jnp.float32(b),
                                   jnp.float32(gamma))
    np.testing.assert_allclose(np.asarray(hf), head_f, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(hc), head_c, rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(np.asarray(tf), tail_f, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(tc), tail_c, rtol=1e-6, atol=1e-6)


def test_batched_device_resident_pass_through(clusters):
    """fit_transform_batched must accept a device-resident jax.Array
    (the product path: capture output lives in HBM) and produce exactly
    the host-input result — no host round-trip, no numeric drift."""
    x, _ = clusters
    clouds = np.stack([x, x[::-1].copy()]).astype(np.float32)
    cfg = UMAPConfig(n_neighbors=6, n_components=3, random_state=42,
                     metric="cosine", n_epochs=50)
    host = fit_transform_batched(clouds, cfg)
    dev = fit_transform_batched(jnp.asarray(clouds), cfg)
    np.testing.assert_array_equal(host, dev)

"""Large-n UMAP (edge-list path): structure preservation, determinism,
dispatch, and agreement of the shared sub-stages with the dense path."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tdax.ops.umap import UMAP
from tdax.ops.umap.sparse_path import (build_sym_edges, embed_sparse,
                                       knn_blocked, spectral_init_edges)


def test_knn_blocked_matches_exact():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(300, 16)).astype(np.float32))
    idx, dists = knn_blocked(x, 8, "euclidean", block_rows=128)
    # blocking (incl. the padded tail block) must not change anything
    idx1, dists1 = knn_blocked(x, 8, "euclidean", block_rows=512)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx1))
    np.testing.assert_array_equal(np.asarray(dists), np.asarray(dists1))
    # and the device expansion-form distances track exact f64 numpy
    # (ties near the k-th neighbor may swap set members, so compare
    # sorted distance lists with the f32-cancellation tolerance)
    d2 = np.asarray(((x[:, None] - x[None, :]) ** 2).sum(-1))
    ref = np.sort(np.sqrt(np.sort(d2, axis=1)[:, :8]), axis=1)
    np.testing.assert_allclose(np.sort(np.asarray(dists), axis=1), ref,
                               rtol=2e-3, atol=2e-3)
    assert (np.asarray(idx)[:, 0] == np.arange(300)).all()  # self first


def test_build_sym_edges_matches_dense_symmetrization():
    """Edge-list W == dense A + A^T - A o A^T built from the SAME
    membership lists (the algebra under test is the host COO merge, so
    the dense side is assembled in numpy from identical inputs — a
    second device distance pass would diverge in TPU f32)."""
    from tdax.ops.umap.fuzzy import (knn, membership_strengths_knn,
                                     pairwise, smooth_knn_dist)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(80, 8)).astype(np.float32))
    dist = pairwise(x, "euclidean")
    idx, dists = knn(dist, 6)
    sigma, rho = smooth_knn_dist(dists, 6.0)
    w_knn = membership_strengths_knn(idx, dists, sigma, rho)
    head, tail, wgt = build_sym_edges(np.asarray(idx), np.asarray(w_knn))

    a = np.zeros((80, 80), np.float64)
    rows = np.repeat(np.arange(80), 6)
    np.maximum.at(a, (rows, np.asarray(idx).reshape(-1)),
                  np.asarray(w_knn, np.float64).reshape(-1))
    np.fill_diagonal(a, 0.0)
    w_dense = a + a.T - a * a.T

    rebuilt = np.zeros((80, 80), np.float64)
    rebuilt[head, tail] = wgt
    np.testing.assert_allclose(rebuilt, w_dense, rtol=1e-5, atol=1e-6)


def test_spectral_init_edges_separates_components():
    """Two disconnected cliques must land apart in the spectral init."""
    n = 64
    head, tail, w = [], [], []
    for base in (0, 32):
        for i in range(32):
            for j in range(i + 1, 32):
                head += [base + i, base + j]
                tail += [base + j, base + i]
                w += [1.0, 1.0]
    emb = np.asarray(spectral_init_edges(
        jnp.asarray(np.array(head, np.int32)),
        jnp.asarray(np.array(tail, np.int32)),
        jnp.asarray(np.array(w, np.float32)), n, 2, jax.random.PRNGKey(0)))
    # the bottom non-trivial eigenvector (column 0) is the component
    # indicator: constant within a clique, opposite signs across them
    c0a, c0b = emb[:32, 0], emb[32:, 0]
    assert (np.sign(c0a) == np.sign(c0a[0])).all()
    assert (np.sign(c0b) == np.sign(c0b[0])).all()
    assert np.sign(c0a[0]) != np.sign(c0b[0])
    gap = abs(c0a.mean() - c0b.mean())
    assert gap > 5 * max(c0a.std(), c0b.std())


def test_spectral_lobpcg_agrees_with_dense_eigh_above_threshold():
    """The scale path's default init is real spectral semantics: at n
    just above sparse_threshold (2048), the LOBPCG init must span the
    same bottom non-trivial Laplacian eigenvectors a dense eigh finds on
    the SAME graph (umap-learn's init='spectral' contract — the
    reference runs umap defaults, debug_tda_pipeline.py:96-102)."""
    from tdax.ops.umap.fuzzy import membership_strengths_knn, smooth_knn_dist
    from tdax.ops.umap.sparse_path import spectral_init_lobpcg

    rng = np.random.default_rng(21)
    n = 2100
    # connected cloud with distinct bottom eigenvalues (4:2:1 box)
    x = (rng.uniform(size=(n, 3)) * np.array([4.0, 2.0, 1.0])).astype(np.float32)
    idx, dists = knn_blocked(jnp.asarray(x), 15, "euclidean")
    sigma, rho = smooth_knn_dist(dists, 15.0, local_connectivity=1.0)
    w = membership_strengths_knn(idx, dists, sigma, rho)
    head, tail, wgt = build_sym_edges(np.asarray(idx), np.asarray(w), 1.0)

    emb = np.asarray(spectral_init_lobpcg(
        jnp.asarray(head), jnp.asarray(tail), jnp.asarray(wgt), n, 3,
        jax.random.PRNGKey(42)))
    assert np.isfinite(emb).all()

    wd = np.zeros((n, n))
    wd[head, tail] = wgt
    deg = wd.sum(1)
    inv = np.where(deg > 0, 1.0 / np.sqrt(np.maximum(deg, 1e-12)), 0.0)
    lap = np.eye(n) - inv[:, None] * wd * inv[None, :]
    vals, vecs = np.linalg.eigh(lap)
    assert vals[1] > 1e-6, "test graph must be connected"
    q, _ = np.linalg.qr(emb)
    for j in range(3):
        proj = np.linalg.norm(q.T @ vecs[:, 1 + j])
        assert proj > 0.9, (
            f"LOBPCG init lost dense eigenvector {j} "
            f"(lam={vals[1 + j]:.5f}): projection {proj:.3f}")


def test_spectral_lobpcg_separates_components():
    """Disconnected graphs: the deflated-complement LOBPCG's remaining
    eigenvalue-2 eigenvectors are component indicators, so two cliques
    must land apart (the property the dense path gets from eigh)."""
    from tdax.ops.umap.sparse_path import spectral_init_lobpcg
    n = 64
    head, tail, w = [], [], []
    for base in (0, 32):
        for i in range(32):
            for j in range(i + 1, 32):
                head += [base + i, base + j]
                tail += [base + j, base + i]
                w += [1.0, 1.0]
    order = np.lexsort((tail, head))
    emb = np.asarray(spectral_init_lobpcg(
        jnp.asarray(np.array(head, np.int32)[order]),
        jnp.asarray(np.array(tail, np.int32)[order]),
        jnp.asarray(np.array(w, np.float32)[order]), n, 2,
        jax.random.PRNGKey(0), m=100))
    c0a, c0b = emb[:32, 0], emb[32:, 0]
    assert (np.sign(c0a) == np.sign(c0a[0])).all()
    assert (np.sign(c0b) == np.sign(c0b[0])).all()
    assert np.sign(c0a[0]) != np.sign(c0b[0])
    gap = abs(c0a.mean() - c0b.mean())
    assert gap > 5 * max(c0a.std(), c0b.std())


def _sparse_umap(x, **kw):
    u = UMAP(n_components=2, random_state=42, **kw)
    u.sparse_threshold = 16  # force the edge-list path
    return u.fit_transform(x)


def test_sparse_cluster_separation():
    """3 well-separated gaussian clusters stay separated (silhouette)."""
    rng = np.random.default_rng(2)
    centers = rng.normal(size=(3, 32)) * 8
    x = np.concatenate([c + rng.normal(0, 0.5, (400, 32)) for c in centers])
    labels = np.repeat(np.arange(3), 400)
    emb = _sparse_umap(x.astype(np.float32), n_neighbors=15, n_epochs=150)
    assert np.isfinite(emb).all()
    from tdax.metrics.silhouette import silhouette_score
    s = float(silhouette_score(emb, labels))
    assert s > 0.7, f"clusters collapsed: silhouette={s:.3f}"


def test_sparse_circle_preserved():
    """A noisy circle in 20-d keeps one dominant H1 class after UMAP."""
    rng = np.random.default_rng(3)
    n = 600
    theta = np.linspace(0, 2 * np.pi, n, endpoint=False)
    circle = np.stack([np.cos(theta), np.sin(theta)], 1)
    basis = np.linalg.qr(rng.normal(size=(20, 2)))[0]
    x = circle @ basis.T * 5 + rng.normal(0, 0.05, (n, 20))
    emb = _sparse_umap(x.astype(np.float32), n_neighbors=15, n_epochs=400)

    from tdax.ops.rips import rips
    h1 = rips(emb.astype(np.float64), maxdim=1)["dgms"][1]
    pers = h1[np.isfinite(h1[:, 1])]
    pers = pers[:, 1] - pers[:, 0]
    assert len(pers) > 0
    top = np.sort(pers)[::-1]
    second = top[1] if len(top) > 1 else 0.0
    assert top[0] > 3 * second, f"no dominant loop: {top[:3]}"


def test_sparse_deterministic_and_dispatch():
    rng = np.random.default_rng(4)
    # structured data (2 clusters): both paths must separate them even
    # though their float trajectories differ (eigh vs LOBPCG spectral
    # init, dense vs edge-list layout).  150 epochs: the spectral init
    # starts a disconnected graph's components at single points
    # (indicator eigenvectors — umap/dense-path semantics), so the
    # layout needs its converged length to spread them.
    x = np.concatenate([rng.normal(0, 0.5, (100, 12)),
                        rng.normal(6, 0.5, (100, 12))]).astype(np.float32)
    labels = np.repeat([0, 1], 100)

    e1 = _sparse_umap(x, n_neighbors=10, n_epochs=150)
    e2 = _sparse_umap(x, n_neighbors=10, n_epochs=150)
    np.testing.assert_array_equal(e1, e2)  # deterministic under the key

    # default threshold leaves small clouds on the dense path, bit-identical
    u_dense = UMAP(n_components=2, n_neighbors=10, n_epochs=60,
                   random_state=42)
    assert u_dense.sparse_threshold == 2048
    d1 = u_dense.fit_transform(x)
    d2 = UMAP(n_components=2, n_neighbors=10, n_epochs=60,
              random_state=42).fit_transform(x)
    np.testing.assert_array_equal(d1, d2)

    from tdax.metrics.silhouette import silhouette_score
    # 0.6: clusters clearly separated (random labels ~ 0).  The old 0.8
    # bar was calibrated for the PCA init; the spectral init's
    # single-point component start leaves a couple of stragglers at
    # this epoch count (measured 0.70).
    assert float(silhouette_score(e1, labels)) > 0.6
    # dense at 60 epochs is under-converged; separation just has to exist
    # (its own quality bars live in test_umap.py)
    assert float(silhouette_score(d1, labels)) > 0.3


def test_sparse_transform_places_new_points():
    """Edge-list transform: new points from known clusters land in their
    own cluster's region of the fitted embedding, train points stay
    fixed, and the result is deterministic."""
    rng = np.random.default_rng(5)
    centers = rng.normal(size=(3, 24)) * 8
    x_tr = np.concatenate([c + rng.normal(0, 0.5, (150, 24)) for c in centers])
    x_new = np.concatenate([c + rng.normal(0, 0.5, (40, 24)) for c in centers])
    lab_tr = np.repeat(np.arange(3), 150)
    lab_new = np.repeat(np.arange(3), 40)

    u = UMAP(n_components=2, n_neighbors=10, n_epochs=150, random_state=42)
    u.sparse_threshold = 16  # force the edge-list path for fit AND transform
    emb_tr = u.fit_transform(x_tr.astype(np.float32))
    before = np.array(u.embedding_)
    emb_new = u.transform(x_new.astype(np.float32))
    np.testing.assert_array_equal(before, u.embedding_)  # train side fixed
    assert np.isfinite(emb_new).all()

    # each new point's nearest train centroid (in embedding space) must
    # be its own cluster's
    cents = np.stack([emb_tr[lab_tr == c].mean(0) for c in range(3)])
    d = np.linalg.norm(emb_new[:, None] - cents[None], axis=-1)
    acc = float((np.argmin(d, 1) == lab_new).mean())
    assert acc > 0.95, f"transform misplaced points: acc={acc:.2f}"

    emb_new2 = u.transform(x_new.astype(np.float32))
    np.testing.assert_array_equal(emb_new, emb_new2)  # deterministic


def test_sparse_transform_agrees_with_dense_geometry():
    """Dense-fit object: the forced edge-list transform and the dense
    transform must make the same cluster assignments (trajectories
    differ — the RNG draws have different shapes)."""
    rng = np.random.default_rng(6)
    centers = rng.normal(size=(2, 16)) * 10
    x_tr = np.concatenate([c + rng.normal(0, 0.5, (80, 16)) for c in centers])
    x_new = np.concatenate([c + rng.normal(0, 0.5, (30, 16)) for c in centers])
    lab_tr = np.repeat(np.arange(2), 80)
    lab_new = np.repeat(np.arange(2), 30)

    u = UMAP(n_components=2, n_neighbors=8, n_epochs=100, random_state=42)
    emb_tr = u.fit_transform(x_tr.astype(np.float32))
    dense_new = u.transform(x_new.astype(np.float32))
    u.sparse_threshold = 8  # now force the edge-list transform
    sparse_new = u.transform(x_new.astype(np.float32))

    cents = np.stack([emb_tr[lab_tr == c].mean(0) for c in range(2)])
    for emb_new, name in ((dense_new, "dense"), (sparse_new, "sparse")):
        d = np.linalg.norm(emb_new[:, None] - cents[None], axis=-1)
        acc = float((np.argmin(d, 1) == lab_new).mean())
        assert acc == 1.0, f"{name} transform misplaced points: acc={acc:.2f}"


def test_knn_blocked_cross_matches_exact():
    from tdax.ops.umap.sparse_path import knn_blocked_cross
    rng = np.random.default_rng(7)
    a = jnp.asarray(rng.normal(size=(150, 12)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(90, 12)).astype(np.float32))
    idx, dists = knn_blocked_cross(a, b, 6, "euclidean", block_rows=64)
    idx1, dists1 = knn_blocked_cross(a, b, 6, "euclidean", block_rows=512)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx1))
    np.testing.assert_array_equal(np.asarray(dists), np.asarray(dists1))
    d2 = np.asarray(((np.asarray(a)[:, None] - np.asarray(b)[None]) ** 2).sum(-1))
    ref = np.sort(np.sqrt(np.sort(d2, axis=1)[:, :6]), axis=1)
    np.testing.assert_allclose(np.sort(np.asarray(dists), axis=1), ref,
                               rtol=2e-3, atol=2e-3)


def test_sparse_layout_mesh_matches_single_device():
    """The edge-sharded layout (psum over the mesh) preserves structure
    and tracks the single-device layout: same clusters, near-identical
    geometry (the psum's summation order is the only difference)."""
    from tdax.parallel import make_mesh
    from tdax.ops.umap.sparse_path import (membership_strengths_knn,
                                           optimize_layout_edges,
                                           optimize_layout_edges_sharded,
                                           pca_init, smooth_knn_dist)
    rng = np.random.default_rng(9)
    centers = rng.normal(size=(3, 16)) * 8
    x = np.concatenate([c + rng.normal(0, 0.5, (80, 16)) for c in centers])
    xj = jnp.asarray(x.astype(np.float32))
    idx, dists = knn_blocked(xj, 10, "euclidean")
    sigma, rho = smooth_knn_dist(dists, 10.0, local_connectivity=1.0)
    w = membership_strengths_knn(idx, dists, sigma, rho)
    head, tail, wgt = build_sym_edges(np.asarray(idx), np.asarray(w), 1.0)
    init = pca_init(xj, 2, jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(2)
    args = (init, jnp.asarray(head), jnp.asarray(tail), jnp.asarray(wgt),
            240, 100, key, 1.577, 0.895)
    e1 = np.asarray(optimize_layout_edges(*args))
    mesh = make_mesh(dp=8, tp=1)
    e2 = np.asarray(optimize_layout_edges_sharded(*args, mesh))
    # edge count 240*10*~2 is not divisible by 8 after symmetrization,
    # so the weight-0 padding path is exercised too
    corr = np.corrcoef(e1.ravel(), e2.ravel())[0, 1]
    assert corr > 0.999, f"sharded layout diverged: corr={corr:.4f}"
    from tdax.metrics.silhouette import silhouette_score
    labels = np.repeat(np.arange(3), 80)
    s = float(silhouette_score(e2, labels))
    assert s > 0.7, f"clusters collapsed under the mesh: silhouette={s:.3f}"


def test_knn_blocked_mesh_matches_single_device():
    """Mesh-sharded kNN is bit-equal to the single-device blocked kNN
    (row blocking does not change any output element's arithmetic);
    n chosen non-divisible by the axis size to exercise the padding."""
    from tdax.parallel import make_mesh
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(205, 24)).astype(np.float32))
    mesh = make_mesh(dp=8, tp=1)
    for metric in ("euclidean", "cosine"):
        i1, d1 = knn_blocked(x, 12, metric)
        i2, d2 = knn_blocked(x, 12, metric, mesh=mesh)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))


@pytest.mark.parametrize("n_new", [64, 53])  # divisible and padded
def test_fixed_tail_layout_mesh_bit_equal(n_new):
    """The head-sharded transform layout is BIT-EQUAL to the
    single-device one: tails are fixed so heads are independent, and
    the negative stream is drawn in global shape and sliced per shard."""
    from tdax.parallel import make_mesh
    from tdax.ops.umap.sparse_path import (
        optimize_layout_edges_fixed_tail,
        optimize_layout_edges_fixed_tail_sharded)
    rng = np.random.default_rng(13)
    n_train, k, d = 120, 8, 2
    train_emb = jnp.asarray(rng.normal(size=(n_train, d)).astype(np.float32))
    head = jnp.repeat(jnp.arange(n_new, dtype=jnp.int32), k)
    tail = jnp.asarray(rng.integers(0, n_train, n_new * k).astype(np.int32))
    wgt = jnp.asarray(rng.uniform(0.2, 1.0, n_new * k).astype(np.float32))
    init = jnp.asarray(rng.normal(size=(n_new, d)).astype(np.float32))
    key = jax.random.PRNGKey(3)
    e1 = np.asarray(optimize_layout_edges_fixed_tail(
        init, train_emb, head, tail, wgt, 60, key, 1.577, 0.895))
    mesh = make_mesh(dp=8, tp=1)
    e2 = np.asarray(optimize_layout_edges_fixed_tail_sharded(
        init, train_emb, head, tail, wgt, 60, key, 1.577, 0.895, mesh))
    np.testing.assert_array_equal(e1, e2)


def test_knn_blocked_cross_mesh_matches_single_device():
    """Mesh-sharded cross-kNN is bit-equal to the single-device one."""
    from tdax.parallel import make_mesh
    from tdax.ops.umap.sparse_path import knn_blocked_cross
    rng = np.random.default_rng(15)
    xn = jnp.asarray(rng.normal(size=(77, 20)).astype(np.float32))
    xt = jnp.asarray(rng.normal(size=(150, 20)).astype(np.float32))
    mesh = make_mesh(dp=8, tp=1)
    for metric in ("euclidean", "cosine"):
        i1, d1 = knn_blocked_cross(xn, xt, 9, metric)
        i2, d2 = knn_blocked_cross(xn, xt, 9, metric, mesh=mesh)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))

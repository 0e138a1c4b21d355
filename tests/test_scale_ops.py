"""Scale-path kernels: Pallas distances (interpret on CPU), Boruvka H0,
shard_map row-block distances/kNN on the 8-device mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tdax.ops.distances import pairwise_euclidean_np
from tdax.ops.pallas_distances import pairwise_sq_euclidean_pallas
from tdax.ops.rips.mst import boruvka_mst_weights, h0_diagram_tpu
from tdax.ops.rips.reference import rips_reference
from tdax.parallel import make_mesh
from tdax.parallel.sharded_ops import sharded_knn, sharded_pairwise_sq_euclidean


@pytest.mark.parametrize("n,d", [(36, 3), (100, 17), (130, 257)])
def test_pallas_sqdist_matches_numpy(n, d):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(n, d)).astype(np.float32)
    ref = pairwise_euclidean_np(x) ** 2
    out = np.asarray(pairwise_sq_euclidean_pallas(jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("seed", [0, 1])
def test_boruvka_matches_unionfind_h0(seed):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(50, 4))
    dist = pairwise_euclidean_np(x)
    dgm0_ref = rips_reference(dist, maxdim=0)[0]
    dgm0_tpu = h0_diagram_tpu(dist)
    ref_fin = np.sort(dgm0_ref[np.isfinite(dgm0_ref[:, 1]), 1])
    tpu_fin = np.sort(dgm0_tpu[np.isfinite(dgm0_tpu[:, 1]), 1])
    np.testing.assert_allclose(tpu_fin, ref_fin, rtol=1e-6)
    assert np.isinf(dgm0_tpu[:, 1]).sum() == np.isinf(dgm0_ref[:, 1]).sum() == 1


def test_boruvka_disconnected_threshold():
    x = np.array([[0, 0], [1, 0], [10, 0], [11, 0]], float)
    dist = pairwise_euclidean_np(x)
    w = boruvka_mst_weights(dist, thresh=2.0)
    assert np.isfinite(w).sum() == 2  # two intra-pair edges
    dgm0 = h0_diagram_tpu(dist, thresh=2.0)
    assert np.isinf(dgm0[:, 1]).sum() == 2  # two components


def test_boruvka_duplicate_points():
    x = np.array([[0, 0], [0, 0], [3, 0]], float)
    dist = pairwise_euclidean_np(x)
    dgm0 = h0_diagram_tpu(dist)
    # zero-weight merge is dropped (ripser behavior), one finite bar at 3
    fin = dgm0[np.isfinite(dgm0[:, 1])]
    np.testing.assert_allclose(fin, [[0.0, 3.0]])


def test_sharded_sqdist_matches_dense():
    mesh = make_mesh(dp=8, tp=1)
    rng = np.random.default_rng(2)
    x = rng.normal(size=(64, 32)).astype(np.float32)
    out = np.asarray(sharded_pairwise_sq_euclidean(jnp.asarray(x), mesh))
    ref = pairwise_euclidean_np(x) ** 2
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_sharded_knn_matches_sklearn():
    mesh = make_mesh(dp=8, tp=1)
    rng = np.random.default_rng(3)
    x = rng.normal(size=(64, 16)).astype(np.float32)
    idx, dists = sharded_knn(jnp.asarray(x), 5, mesh)
    from sklearn.neighbors import NearestNeighbors
    nn = NearestNeighbors(n_neighbors=5).fit(x)
    skl_d, _ = nn.kneighbors(x)
    np.testing.assert_allclose(dists, skl_d, atol=1e-4)
    assert (idx[:, 0] == np.arange(64)).all()


def test_rips_at_scale_matches_reference():
    from tdax.pipeline.scale import rips_at_scale
    rng = np.random.default_rng(5)
    # two gaussian clusters; threshold keeps intra-cluster simplices only
    x = np.concatenate([rng.normal(0, 0.5, (30, 8)),
                        rng.normal(4, 0.5, (30, 8))]).astype(np.float32)
    out = rips_at_scale(x, maxdim=1, thresh=2.5)["dgms"]
    dist = pairwise_euclidean_np(x)
    ref = rips_reference(dist.astype(np.float32).astype(np.float64),
                         maxdim=1, thresh=2.5)
    # H0 from the on-device Boruvka path
    np.testing.assert_allclose(
        np.sort(out[0][np.isfinite(out[0][:, 1]), 1]),
        np.sort(ref[0][np.isfinite(ref[0][:, 1]), 1]), rtol=1e-4)
    assert np.isinf(out[0][:, 1]).sum() == np.isinf(ref[0][:, 1]).sum() == 2
    # H1 from the native engine on the TPU-computed distances
    np.testing.assert_allclose(np.sort(out[1], axis=0), np.sort(ref[1], axis=0),
                               rtol=1e-4, atol=1e-5)


def test_rips_at_scale_with_mesh():
    from tdax.pipeline.scale import rips_at_scale
    mesh = make_mesh(dp=8, tp=1)
    rng = np.random.default_rng(6)
    x = rng.normal(size=(64, 16)).astype(np.float32)
    out = rips_at_scale(x, maxdim=1, mesh=mesh)["dgms"]
    dist = pairwise_euclidean_np(x)
    ref = rips_reference(dist.astype(np.float32).astype(np.float64), maxdim=1)
    np.testing.assert_allclose(np.sort(out[1], axis=0), np.sort(ref[1], axis=0),
                               rtol=1e-4, atol=1e-4)


def test_sparse_engine_matches_dense_thresholded():
    """Sparse CSR engine == dense engine on the same thresholded filtration."""
    from tdax.ops.rips import native
    if not native.available():
        pytest.skip("native engine not built")
    from tdax.ops.rips.sparse import csr_from_knn, rips_sparse
    from tdax.ops.rips.reference import rips_reference
    rng = np.random.default_rng(11)
    z = rng.normal(size=(80, 3))
    z /= np.linalg.norm(z, axis=1, keepdims=True)  # 2-sphere: H2 content
    dist = pairwise_euclidean_np(z).astype(np.float32)
    k = 40
    order = np.argsort(dist, axis=1)
    knn_idx = order[:, :k]
    knn_dist = np.take_along_axis(dist, knn_idx, axis=1)
    thresh = float(np.median(knn_dist[:, 25]))

    indptr, indices, data = csr_from_knn(knn_idx, knn_dist, thresh)
    sp = rips_sparse(indptr, indices, data, maxdim=2)
    ref = rips_reference(dist.astype(np.float64), maxdim=2, thresh=thresh)
    for p in range(3):
        assert sp[p].shape == ref[p].shape, f"dim {p}: {sp[p].shape} vs {ref[p].shape}"
        fin_s = sp[p][np.isfinite(sp[p][:, 1])]
        fin_r = ref[p][np.isfinite(ref[p][:, 1])]
        np.testing.assert_allclose(np.sort(fin_s, axis=0), np.sort(fin_r, axis=0),
                                   rtol=1e-5, atol=1e-6, err_msg=f"dim {p}")
        assert np.isinf(sp[p][:, 1]).sum() == np.isinf(ref[p][:, 1]).sum()


def test_csr_completeness_guard():
    from tdax.ops.rips.sparse import csr_from_knn
    rng = np.random.default_rng(12)
    x = rng.normal(size=(30, 3))
    dist = pairwise_euclidean_np(x).astype(np.float32)
    order = np.argsort(dist, axis=1)
    k = 5
    knn_idx = order[:, :k]
    knn_dist = np.take_along_axis(dist, knn_idx, axis=1)
    # threshold beyond the k-th neighbor: the k-NN graph is incomplete
    with pytest.raises(ValueError, match="increase k"):
        csr_from_knn(knn_idx, knn_dist, thresh=float(dist.max()))


def test_rips_at_scale_sparse_matches_dense():
    from tdax.ops.rips import native
    if not native.available():
        pytest.skip("native engine not built")
    from tdax.pipeline.scale import rips_at_scale_sparse
    from tdax.ops.rips.reference import rips_reference
    rng = np.random.default_rng(13)
    z = rng.normal(size=(100, 4))
    z /= np.linalg.norm(z, axis=1, keepdims=True)
    x = (z @ rng.normal(size=(4, 32))).astype(np.float32)
    out = rips_at_scale_sparse(x, maxdim=1, target_degree=25)
    dist = pairwise_euclidean_np(x.astype(np.float32)).astype(np.float64)
    ref = rips_reference(dist, maxdim=1, thresh=out["thresh"])
    for p in range(2):
        fin_s = out["dgms"][p][np.isfinite(out["dgms"][p][:, 1])]
        fin_r = ref[p][np.isfinite(ref[p][:, 1])]
        assert fin_s.shape == fin_r.shape, f"dim {p}"
        np.testing.assert_allclose(np.sort(fin_s, axis=0), np.sort(fin_r, axis=0),
                                   rtol=1e-4, atol=1e-4, err_msg=f"dim {p}")


def test_rips_at_scale_sparse_blocked_matches_unblocked():
    from tdax.ops.rips import native
    if not native.available():
        pytest.skip("native engine not built")
    from tdax.pipeline.scale import rips_at_scale_sparse
    rng = np.random.default_rng(14)
    z = rng.normal(size=(100, 4))
    z /= np.linalg.norm(z, axis=1, keepdims=True)
    x = (z @ rng.normal(size=(4, 32))).astype(np.float32)
    # fused_max=0 forces the blocked approx_min_k branch; the default is
    # the single fused dispatch — both must produce the same filtration
    a = rips_at_scale_sparse(x, maxdim=1, target_degree=25, block_rows=32,
                             fused_max=0)
    b = rips_at_scale_sparse(x, maxdim=1, target_degree=25, block_rows=100,
                             fused_max=0)
    f = rips_at_scale_sparse(x, maxdim=1, target_degree=25)
    assert a["n_edges"] == b["n_edges"] == f["n_edges"]
    for p in range(2):
        np.testing.assert_array_equal(a["dgms"][p], b["dgms"][p])
        np.testing.assert_allclose(
            np.where(np.isfinite(a["dgms"][p]), a["dgms"][p], -1),
            np.where(np.isfinite(f["dgms"][p]), f["dgms"][p], -1), atol=1e-5)


def test_rips_at_scale_sparse_device_resident_input():
    """A jax.Array input (the product path: activations born in HBM)
    must skip the host round-trip and produce identical diagrams."""
    from tdax.ops.rips import native
    if not native.available():
        pytest.skip("native engine not built")
    import jax
    import jax.numpy as jnp
    from tdax.pipeline.scale import rips_at_scale_sparse
    rng = np.random.default_rng(15)
    z = rng.normal(size=(80, 4))
    z /= np.linalg.norm(z, axis=1, keepdims=True)
    x = (z @ rng.normal(size=(4, 32))).astype(np.float32)
    a = rips_at_scale_sparse(x, maxdim=1, target_degree=20)
    b = rips_at_scale_sparse(jax.device_put(jnp.asarray(x)), maxdim=1,
                             target_degree=20)
    assert a["n_edges"] == b["n_edges"]
    for p in range(2):
        np.testing.assert_array_equal(a["dgms"][p], b["dgms"][p])


def test_select_threshold_matches_host_reference():
    """The device-side threshold (top_k kth + median, one scalar fetch)
    must agree with the host formulation it replaced: np.partition of
    the sampled rows' distances at index target_degree, then median."""
    from tdax.pipeline.scale import _select_threshold
    rng = np.random.default_rng(7)
    x = rng.normal(size=(300, 24)).astype(np.float32)
    k = 11
    t = _select_threshold(jnp.asarray(x), 300, k, sample=64)
    rows = np.linspace(0, 299, 64).astype(np.int32)
    d = pairwise_euclidean_np(x).astype(np.float32)[rows]
    kth = np.partition(d, k, axis=1)[:, k]
    assert abs(t - float(np.median(kth))) <= 1e-4 * float(np.median(kth))


@pytest.mark.parametrize("fused", [True, False])
def test_scale_sparse_raises_on_row_budget_truncation(fused):
    """Completeness is never silently traded: a row with more
    in-threshold neighbors than the per-row budget must raise, on both
    the fused and the blocked extraction paths."""
    from tdax.pipeline.scale import rips_at_scale_sparse
    rng = np.random.default_rng(3)
    # one tight cluster: every point has n-1 in-threshold neighbors,
    # far beyond target_degree * headroom
    x = (rng.normal(size=(60, 8)) * 1e-3).astype(np.float32)
    kwargs = {} if fused else {"fused_max": 0, "block_rows": 32}
    with pytest.raises(ValueError, match="degree_headroom"):
        rips_at_scale_sparse(x, maxdim=1, target_degree=8,
                             degree_headroom=1.0, **kwargs)


def test_rips_at_scale_sparse_mesh_matches_single_device():
    """Mesh-sharded edge extraction (rows over dp) must reproduce the
    single-device blocked path: same filtration, same diagrams."""
    from tdax.ops.rips import native
    if not native.available():
        pytest.skip("native engine not built")
    from tdax.pipeline.scale import rips_at_scale_sparse
    mesh = make_mesh(dp=8, tp=1)
    rng = np.random.default_rng(21)
    z = rng.normal(size=(100, 4))
    z /= np.linalg.norm(z, axis=1, keepdims=True)
    x = (z @ rng.normal(size=(4, 32))).astype(np.float32)
    a = rips_at_scale_sparse(x, maxdim=1, target_degree=25, fused_max=0,
                             block_rows=100)
    b = rips_at_scale_sparse(x, maxdim=1, target_degree=25, fused_max=0,
                             block_rows=100, mesh=mesh)
    assert a["n_edges"] == b["n_edges"]
    assert abs(a["thresh"] - b["thresh"]) < 1e-6
    for p in range(2):
        np.testing.assert_allclose(
            np.where(np.isfinite(a["dgms"][p]), a["dgms"][p], -1),
            np.where(np.isfinite(b["dgms"][p]), b["dgms"][p], -1),
            atol=1e-5)


def test_rips_at_scale_sparse_mesh_padded_rows():
    """n not divisible by the mesh axis: padded rows must be dropped."""
    from tdax.ops.rips import native
    if not native.available():
        pytest.skip("native engine not built")
    from tdax.pipeline.scale import rips_at_scale_sparse
    mesh = make_mesh(dp=8, tp=1)
    rng = np.random.default_rng(22)
    x = rng.normal(size=(93, 16)).astype(np.float32)  # 93 % 8 != 0
    a = rips_at_scale_sparse(x, maxdim=1, target_degree=20, fused_max=0,
                             block_rows=93)
    b = rips_at_scale_sparse(x, maxdim=1, target_degree=20, fused_max=0,
                             block_rows=93, mesh=mesh)
    assert a["n_edges"] == b["n_edges"]
    for p in range(2):
        np.testing.assert_allclose(
            np.where(np.isfinite(a["dgms"][p]), a["dgms"][p], -1),
            np.where(np.isfinite(b["dgms"][p]), b["dgms"][p], -1),
            atol=1e-5)

"""Numeric-parity tier for the ops layer, vs scipy/sklearn references."""

import numpy as np
import pytest
import scipy.sparse as sp

rng = np.random.default_rng(0)


def test_csr_ops():
    from dance_tpu.ops.sparse import (csr_col_sums, csr_from_scipy, csr_matmat, csr_matvec,
                                      csr_rmatmat, csr_row_sums, csr_scale_rows, csr_to_dense,
                                      csr_to_scipy)
    A = sp.random(30, 20, density=0.2, random_state=0, format="csr", dtype=np.float32)
    Aj = csr_from_scipy(A)
    v = rng.random(20).astype(np.float32)
    B = rng.random((20, 5)).astype(np.float32)
    C = rng.random((30, 5)).astype(np.float32)
    np.testing.assert_allclose(csr_matvec(Aj, v), A @ v, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(csr_matmat(Aj, B), A @ B, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(csr_rmatmat(Aj, C), A.T @ C, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(csr_row_sums(Aj), np.asarray(A.sum(1)).ravel(), rtol=1e-5)
    np.testing.assert_allclose(csr_col_sums(Aj), np.asarray(A.sum(0)).ravel(), rtol=1e-5)
    np.testing.assert_allclose(csr_to_dense(Aj), A.toarray(), rtol=1e-6)
    s = rng.random(30).astype(np.float32)
    np.testing.assert_allclose(csr_to_scipy(csr_scale_rows(Aj, s)).toarray(),
                               (sp.diags(s) @ A).toarray(), rtol=1e-5)


def test_pca_parity():
    from sklearn.decomposition import PCA as SKPCA

    from dance_tpu.ops.linalg import pca, pca_transform
    x = rng.random((100, 30)).astype(np.float32)
    ours = pca(x, 5)
    ref = SKPCA(n_components=5, svd_solver="full").fit(x)
    np.testing.assert_allclose(np.abs(ours.components), np.abs(ref.components_),
                               rtol=1e-2, atol=1e-3)
    np.testing.assert_allclose(ours.embedding, ref.transform(x), rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(ours.explained_variance, ref.explained_variance_,
                               rtol=1e-3, atol=1e-4)
    # transform of new data matches
    x2 = rng.random((10, 30)).astype(np.float32)
    np.testing.assert_allclose(pca_transform(x2, ours), ref.transform(x2), rtol=1e-2,
                               atol=1e-2)


def test_svd_parity():
    from dance_tpu.ops.linalg import randomized_svd
    x = rng.random((60, 40)).astype(np.float32)
    u, s, vt = randomized_svd(x, 6)
    s_ref = np.linalg.svd(x, compute_uv=False)[:6]
    np.testing.assert_allclose(s, s_ref, rtol=1e-3)
    np.testing.assert_allclose(u @ np.diag(s) @ vt,
                               (np.linalg.svd(x, full_matrices=False)[0][:, :6]
                                * s_ref) @ np.linalg.svd(x, full_matrices=False)[2][:6],
                               rtol=1e-2, atol=1e-2)


def test_kmeans():
    from dance_tpu.ops.cluster import kmeans
    centers = np.array([[0, 0], [10, 10], [0, 10]], dtype=np.float32)
    x = np.concatenate([c + 0.5 * rng.standard_normal((50, 2)) for c in centers]).astype(
        np.float32)
    res = kmeans(x, 3, n_init=3, seed=1)
    labels = np.asarray(res.labels)
    true = np.repeat([0, 1, 2], 50)
    from sklearn.metrics import adjusted_rand_score
    assert adjusted_rand_score(true, labels) > 0.99

    # sklearn-style tol stopping converges to the same solution without the
    # fixed-iteration burn (stlearn's StKmeans passes tol=1e-4)
    res_tol = kmeans(x, 3, n_init=3, seed=1, tol=1e-4)
    assert adjusted_rand_score(true, np.asarray(res_tol.labels)) > 0.99
    np.testing.assert_allclose(float(res_tol.inertia), float(res.inertia),
                               rtol=1e-4)


def test_knn_parity():
    from sklearn.neighbors import NearestNeighbors

    from dance_tpu.ops.neighbors import knn
    x = rng.random((80, 10)).astype(np.float32)
    d, i = knn(x, 5, include_self=True)
    ref_d, ref_i = NearestNeighbors(n_neighbors=5).fit(x).kneighbors(x)
    np.testing.assert_allclose(np.sort(d, 1), np.sort(ref_d, 1), rtol=1e-3, atol=2e-3)
    # neighbor sets should agree
    agree = np.mean([len(set(a) & set(b)) / 5 for a, b in zip(i, ref_i)])
    assert agree > 0.98


def test_knn_graph_no_self():
    from dance_tpu.ops.neighbors import knn_graph
    x = rng.random((40, 6)).astype(np.float32)
    g = knn_graph(x, 4, include_self=False, symmetrize=False)
    assert g.diagonal().sum() == 0
    assert (np.asarray((g > 0).sum(1)).ravel() == 4).all()


def test_nmf():
    from dance_tpu.ops.nmf import nmf
    W0 = np.abs(rng.random((50, 4))).astype(np.float32)
    H0 = np.abs(rng.random((4, 30))).astype(np.float32)
    V = W0 @ H0
    res = nmf(V, 4, n_iter=1000, seed=0)
    recon = np.asarray(res.W) @ np.asarray(res.H)
    rel = np.linalg.norm(V - recon) / np.linalg.norm(V)
    assert rel < 0.02


def test_nnls():
    from dance_tpu.ops.nmf import nnls
    A = np.abs(rng.random((40, 3))).astype(np.float32)
    x_true = np.array([0.2, 0.5, 0.3], dtype=np.float32)
    b = A @ x_true
    x = np.asarray(nnls(A, b, n_iter=2000))
    np.testing.assert_allclose(x, x_true, rtol=0.05, atol=0.01)


def test_louvain():
    from dance_tpu.ops.cluster import louvain
    # two dense blocks, weak cross links
    n = 40
    A = np.zeros((n, n))
    A[:20, :20] = rng.random((20, 20)) < 0.6
    A[20:, 20:] = rng.random((20, 20)) < 0.6
    A[0, 20] = A[20, 0] = 1
    np.fill_diagonal(A, 0)
    labels = louvain(sp.csr_matrix(A), seed=0)
    from sklearn.metrics import adjusted_rand_score
    true = np.repeat([0, 1], 20)
    assert adjusted_rand_score(true, labels) > 0.95


def test_louvain_native_matches_numpy_spec(monkeypatch):
    """The C++ kernel and the numpy behavioral spec agree on a planted
    partition (different RNGs — mt19937_64 vs PCG — so compare partition
    quality: both must recover the planted blocks, and native modularity
    must be >= the spec's minus tolerance)."""
    import dance_tpu.native as native
    from dance_tpu.ops.cluster import louvain
    from sklearn.metrics import adjusted_rand_score
    if native.louvain_labels(sp.csr_matrix(np.eye(2)), resolution=1.0,
                             seed=0, max_passes=1) is None:
        pytest.skip("native louvain unavailable")
    # 3 planted blocks of 25, p_in=0.5, p_out=0.02
    r = np.random.default_rng(7)
    n, b = 75, 25
    true = np.repeat([0, 1, 2], b)
    A = (r.random((n, n)) < 0.02).astype(float)
    for k in range(3):
        A[k * b:(k + 1) * b, k * b:(k + 1) * b] = r.random((b, b)) < 0.5
    A = np.triu(A, 1)
    A = A + A.T
    adj = sp.csr_matrix(A)

    def modularity(labels):
        m2 = adj.sum()
        deg = np.asarray(adj.sum(1)).ravel()
        q = 0.0
        for c in np.unique(labels):
            idx = labels == c
            q += adj[idx][:, idx].sum() / m2 - (deg[idx].sum() / m2) ** 2
        return q

    lab_native = louvain(adj, seed=0)
    monkeypatch.setattr(native, "louvain_labels", lambda *a, **k: None)
    lab_numpy = louvain(adj, seed=0)  # force-exercises the numpy fallback
    assert adjusted_rand_score(true, lab_native) > 0.95
    assert adjusted_rand_score(true, lab_numpy) > 0.95
    assert modularity(lab_native) >= modularity(lab_numpy) - 0.02


def test_sparse_rsvd():
    """Sparse-native randomized SVD never densifies and matches dense SVD."""
    from dance_tpu.ops.linalg import randomized_svd
    from dance_tpu.ops.sparse import csr_from_scipy
    # decaying-spectrum sparse matrix
    u0 = rng.standard_normal((200, 5))
    v0 = rng.standard_normal((5, 120))
    dense = (u0 * np.array([10, 7, 4, 2, 1])) @ v0
    dense[np.abs(dense) < 2.0] = 0  # sparsify
    A = sp.csr_matrix(dense.astype(np.float32))
    u, s, vt = randomized_svd(csr_from_scipy(A), 5)
    s_ref = np.linalg.svd(A.toarray(), compute_uv=False)[:5]
    np.testing.assert_allclose(np.asarray(s), s_ref, rtol=1e-2)


def test_device_forest_matches_sklearn():
    """Device forest (ops/forest.py) tracks the sklearn RF parity oracle."""
    from sklearn.ensemble import RandomForestClassifier

    from dance_tpu.ops.forest import RandomForest

    r = np.random.default_rng(7)
    centers = r.standard_normal((5, 40)) * 3
    y = np.repeat(np.arange(5), 120)
    x = (centers[y] + r.standard_normal((600, 40))).astype(np.float32)
    tr = r.permutation(600)[:450]
    te = np.setdiff1d(np.arange(600), tr)

    ours = RandomForest(50, max_depth=8, random_state=0,
                        class_weight="balanced").fit(x[tr], y[tr])
    acc_ours = (ours.predict(x[te]) == y[te]).mean()
    oracle = RandomForestClassifier(50, random_state=0,
                                    class_weight="balanced").fit(x[tr], y[tr])
    acc_skl = (oracle.predict(x[te]) == y[te]).mean()
    assert acc_ours >= acc_skl - 0.05, (acc_ours, acc_skl)

    # probabilities are a distribution over all classes
    proba = ours.predict_proba(x[te])
    assert proba.shape == (len(te), 5)
    np.testing.assert_allclose(proba.sum(1), 1.0, atol=1e-5)

    # deterministic under a fixed seed
    again = RandomForest(50, max_depth=8, random_state=0,
                         class_weight="balanced").fit(x[tr], y[tr])
    np.testing.assert_array_equal(ours.predict(x[te]), again.predict(x[te]))

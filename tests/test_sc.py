"""First-party scanpy-surface parity tests (dance_tpu.sc)."""

import numpy as np
import pytest

from dance_tpu.data import AnnData
from dance_tpu import sc


@pytest.fixture
def adata():
    rng = np.random.default_rng(0)
    X = rng.poisson(2.0, (80, 40)).astype(np.float32)
    a = AnnData(X, obs={"batch": rng.choice([0, 1], 80),
                        "covar": rng.random(80)})
    return a


def test_scale_parity(adata):
    from sklearn.preprocessing import StandardScaler
    ref = StandardScaler().fit_transform(np.asarray(adata.X, np.float64))
    # sklearn uses ddof=0; ours uses ddof=1 (scanpy convention)
    n = adata.n_obs
    ref = ref * np.sqrt((n - 1) / n)
    sc.pp.scale(adata)
    np.testing.assert_allclose(adata.X, ref, rtol=1e-4, atol=1e-4)


def test_normalize_total_median(adata):
    counts = np.asarray(adata.X).sum(1)
    med = np.median(counts)
    sc.pp.normalize_total(adata)
    np.testing.assert_allclose(np.asarray(adata.X).sum(1), med, rtol=1e-4)


def test_filter_roundtrip(adata):
    before = adata.n_vars
    sc.pp.filter_genes(adata, min_cells=5)
    assert adata.n_vars <= before
    assert "n_cells" in adata.var.columns
    sc.pp.filter_cells(adata, min_counts=10)
    assert "n_counts" in adata.obs.columns


def test_combat_removes_batch_shift(adata):
    X = np.asarray(adata.X, np.float64)
    batches = np.asarray(adata.obs["batch"])
    X[batches == 1] += 5.0  # plant a batch effect
    adata._X = X.astype(np.float32)
    sc.pp.combat(adata, key="batch")
    Xc = np.asarray(adata.X)
    shift = abs(Xc[batches == 1].mean() - Xc[batches == 0].mean())
    assert shift < 0.3, f"batch shift not removed: {shift}"


def test_regress_out(adata):
    X = np.asarray(adata.X, np.float64)
    covar = np.asarray(adata.obs["covar"], np.float64)
    X[:, 0] = 10 * covar  # perfectly explained by covariate
    adata._X = X.astype(np.float32)
    sc.pp.regress_out(adata, "covar")
    corr = np.corrcoef(np.asarray(adata.X)[:, 0], covar)[0, 1]
    assert abs(corr) < 0.1, f"covariate effect remains: corr={corr}"


def test_neighbors_and_tl_clustering(adata):
    sc.pp.normalize_total(adata)
    sc.pp.log1p(adata)
    sc.pp.pca(adata, n_comps=10)
    sc.pp.neighbors(adata, n_neighbors=8)
    assert adata.obsp["connectivities"].nnz > 0
    sc.tl.louvain(adata)
    sc.tl.leiden(adata)
    assert "louvain" in adata.obs.columns and "leiden" in adata.obs.columns
    sc.tl.umap(adata)
    assert adata.obsm["X_umap"].shape == (80, 2)


def test_rank_genes_groups(adata):
    rng = np.random.default_rng(1)
    groups = rng.choice(["a", "b"], adata.n_obs)
    X = np.asarray(adata.X, np.float64)
    X[groups == "a", 3] += 10  # gene 3 is an 'a' marker
    adata._X = X.astype(np.float32)
    adata.obs["group"] = groups
    sc.tl.rank_genes_groups(adata, "group", n_genes=5)
    top_a = adata.uns["rank_genes_groups"]["names"]["a"]
    assert adata.var_names[3] == top_a[0]


def test_subsample_and_qc(adata):
    sc.pp.calculate_qc_metrics(adata)
    assert "total_counts" in adata.obs.columns
    sc.pp.subsample(adata, n_obs=30)
    assert adata.n_obs == 30


def test_score_genes(adata):
    sc.tl.score_genes(adata, [adata.var_names[0], adata.var_names[1]],
                      score_name="myscore")
    assert "myscore" in adata.obs.columns


def test_hvg_batch_key(adata):
    sc.pp.log1p(adata)
    sc.pp.highly_variable_genes(adata, n_top_genes=10, batch_key="batch", subset=True)
    assert adata.n_vars == 10
    assert "highly_variable_nbatches" in adata.var.columns


def test_loess_recovers_nonpoly_trend():
    """Loess tracks a sine trend a global quadratic cannot."""
    from dance_tpu.sc.pp import _loess
    rng = np.random.default_rng(0)
    x = np.sort(rng.uniform(0, 10, 2000))
    truth = np.sin(x)
    y = truth + rng.normal(0, 0.1, len(x))
    fit = _loess(x, y, span=0.15)
    assert np.abs(fit - truth).mean() < 0.05
    poly = np.polyval(np.polyfit(x, y, 2), x)
    assert np.abs(poly - truth).mean() > 0.3  # quadratic can't follow it


def test_hvg_seurat_v3_loess_trend():
    """seurat_v3 standardized variances are finite and trend-corrected."""
    rng = np.random.default_rng(0)
    n, g = 500, 300
    mu = rng.gamma(2, 1, g)
    X = rng.poisson(mu, (n, g)).astype(np.float32)
    X[:, :10] = rng.poisson(mu[:10] * rng.gamma(2, 2, (n, 10)))  # overdispersed
    a = AnnData(X=X)
    df = sc.pp.highly_variable_genes(a, flavor="seurat_v3", n_top_genes=20,
                                     inplace=False)
    assert np.isfinite(df["variances_norm"]).all()
    # planted overdispersed genes dominate the selection
    top = set(np.flatnonzero(df["highly_variable"].values))
    assert len(top & set(range(10))) >= 8


def test_umap_layout():
    """UMAP layout separates planted clusters (and is deterministic)."""
    from sklearn.metrics import silhouette_score

    from dance_tpu.datasets.synthetic import synthetic_expression
    x, y = synthetic_expression(200, 80, 3, seed=0, effect=5.0)
    a = AnnData(X=x)
    sc.pp.normalize_total(a)
    sc.pp.log1p(a)
    sc.pp.pca(a, n_comps=10)
    sc.pp.neighbors(a, n_neighbors=10)
    sc.tl.umap(a, n_epochs=200, random_state=0)
    emb = a.obsm["X_umap"]
    assert emb.shape == (200, 2)
    assert np.isfinite(emb).all()
    s = silhouette_score(emb, y)
    assert s > 0.3, f"UMAP layout silhouette too low: {s}"
    # determinism
    sc.tl.umap(a, n_epochs=200, random_state=0)
    np.testing.assert_array_equal(emb, a.obsm["X_umap"])


def test_score_genes_cell_cycle():
    rng = np.random.default_rng(0)
    n = 120
    X = rng.random((n, 30)).astype(np.float32)
    # plant: first 40 cells high on "S" genes 0-2, next 40 high on "G2M" genes 3-5
    X[:40, 0:3] += 3.0
    X[40:80, 3:6] += 3.0
    a = AnnData(X=X)
    s_genes = list(a.var_names[0:3])
    g2m_genes = list(a.var_names[3:6])
    sc.tl.score_genes_cell_cycle(a, s_genes, g2m_genes)
    phase = np.asarray(a.obs["phase"])
    assert (phase[:40] == "S").mean() > 0.9
    assert (phase[40:80] == "G2M").mean() > 0.9
    assert {"S_score", "G2M_score", "phase"} <= set(a.obs.columns)

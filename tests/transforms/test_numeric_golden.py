"""Golden-fixture numeric tests: every registered transform asserts numbers.

Complements test_transforms.py (which covers the most-used transforms): this
file closes the long tail so no registered transform is inventory-only.
References are computed with plain numpy/scipy/sklearn formulas per the
reference implementation's semantics.
"""

import numpy as np
import pytest
import scipy.sparse as sp

from dance_tpu.data import AnnData, Data, MuData


@pytest.fixture
def data():
    rng = np.random.default_rng(1)
    X = rng.poisson(2.0, size=(60, 30)).astype(np.float32)
    X[X < 1] = 0
    adata = AnnData(X=X, obs={"cell_type": rng.choice(list("abc"), 60),
                              "batch": rng.choice([0, 1], 60).astype(str)})
    return Data(adata, train_size=40)


def _X(data):
    return np.asarray(data.data.X)


# --------------------------------------------------------------------------
# normalize
# --------------------------------------------------------------------------

def test_normalize_placeholder(data):
    from dance_tpu.transforms import NormalizePlaceHolder
    before = _X(data).copy()
    NormalizePlaceHolder()(data)
    np.testing.assert_array_equal(_X(data), before)


def test_update_size_factors(data):
    from dance_tpu.transforms import UpdateSizeFactors
    counts = _X(data).sum(1)
    UpdateSizeFactors()(data)
    sf = np.asarray(data.data.obs["size_factors"], np.float64)
    np.testing.assert_allclose(sf, counts / np.median(counts), rtol=1e-5)


def test_tfidf_transform(data):
    from dance_tpu.transforms import tfidfTransform
    X = _X(data).copy()
    tf = X / np.maximum(X.sum(1, keepdims=True), 1e-12)
    idf = X.shape[0] / np.maximum(X.sum(0, keepdims=True), 1e-12)
    tfidfTransform()(data)
    np.testing.assert_allclose(_X(data), tf * idf, rtol=1e-4, atol=1e-6)


# --------------------------------------------------------------------------
# filter family
# --------------------------------------------------------------------------

def test_filter_scanpy_bare(data):
    from dance_tpu.transforms import FilterCellsScanpy, FilterScanpy
    # the bare base is registered for scope completeness but not instantiable
    with pytest.raises(NotImplementedError):
        FilterScanpy(min_counts=10)
    X = _X(data).copy()
    keep = X.sum(1) >= 10
    FilterCellsScanpy(min_counts=10)(data)
    assert data.data.n_obs == int(keep.sum())
    np.testing.assert_array_equal(_X(data), X[keep])


def test_filter_cells_scanpy_order(data):
    from dance_tpu.transforms import FilterCellsScanpyOrder
    X = _X(data).copy()
    keep = (X.sum(1) >= 10) & ((X > 0).sum(1) >= 3)
    FilterCellsScanpyOrder(order=["min_counts", "min_genes"], min_counts=10,
                           min_genes=3)(data)
    assert data.data.n_obs == int(keep.sum())


def test_filter_genes_scanpy_order(data):
    from dance_tpu.transforms import FilterGenesScanpyOrder
    X = _X(data).copy()
    keep = (X.sum(0) >= 30) & ((X > 0).sum(0) >= 5)
    FilterGenesScanpyOrder(order=["min_counts", "min_cells"], min_counts=30,
                           min_cells=5)(data)
    assert data.data.n_vars == int(keep.sum())


def test_filter_genes_percentile(data):
    from dance_tpu.transforms import FilterGenesPercentile
    X = _X(data).copy()
    s = X.sum(0)
    lo, hi = np.percentile(s, 10), np.percentile(s, 90)
    keep = (s >= lo) & (s <= hi)
    FilterGenesPercentile(min_val=10, max_val=90, mode="sum")(data)
    assert data.data.n_vars == int(keep.sum())


def test_filter_genes_common(data):
    from dance_tpu.transforms import FilterGenesCommon
    X = _X(data).copy()
    batch = np.asarray(data.data.obs["batch"])
    keep = np.ones(X.shape[1], bool)
    for b in np.unique(batch):
        keep &= X[batch == b].sum(0) > 0
    FilterGenesCommon(batch_key="batch")(data)
    assert data.data.n_vars == int(keep.sum())


def test_filter_genes_placeholders(data):
    from dance_tpu.transforms import (FilterCellsPlaceHolder,
                                      FilterGenesNumberPlaceHolder,
                                      FilterGenesPlaceHolder)
    shape = _X(data).shape
    FilterGenesPlaceHolder()(data)
    FilterGenesNumberPlaceHolder()(data)
    FilterCellsPlaceHolder()(data)
    assert _X(data).shape == shape
    # placeholders still record the QC stats the planer counts on
    assert "n_counts" in data.data.obs


def test_filter_cells_type(data):
    import pandas as pd

    from dance_tpu.transforms import FilterCellsType
    ct = np.asarray(data.data.obs["cell_type"]).copy()
    ct[:5] = "rare"  # under-represented type
    data.data.obs["cell_type"] = ct
    onehot = pd.get_dummies(pd.Series(ct)).astype(np.float32)
    onehot.index = data.data.obs_names
    data.data.obsm["cell_type"] = onehot
    counts = onehot.sum(0)
    remove_types = counts[counts <= 10].index
    expected = int((~np.isin(ct, remove_types)).sum())
    FilterCellsType(cell_type_threshold=10)(data)
    assert data.data.n_obs == expected == 55


def test_filter_cell_transform_mad(data):
    from dance_tpu.transforms import FilterCellTransform
    n_before = data.data.n_obs
    # inject an extreme outlier cell (log1p(total) far outside 5 MADs)
    X = _X(data).copy()
    X[0] = 5000
    data.data.X = X
    names = list(data.data.obs_names)
    FilterCellTransform()(data)
    assert 0 < data.data.n_obs < n_before
    assert names[0] not in list(data.data.obs_names)  # the outlier is gone
    assert "total_counts" in data.data.obs  # QC stats recorded


def test_scrublet_transform(data):
    from dance_tpu.transforms import ScrubletTransform
    n_before = data.data.n_obs
    ScrubletTransform()(data)
    assert 0 < data.data.n_obs <= n_before
    # doublet scores recorded per retained cell, none flagged post-filter
    assert "doublet_score" in data.data.obs
    assert not data.data.obs["predicted_doublet"].to_numpy().any()


def test_filter_genes_regression(data):
    from dance_tpu.transforms import FilterGenesRegression
    FilterGenesRegression(method="enclasc", num_genes=10)(data)
    assert data.data.n_vars == 10


def test_filter_genes_marker(data):
    from dance_tpu.transforms import CellTopicProfile, FilterGenesMarker
    CellTopicProfile(ct_select="auto", ct_key="cell_type", split_name=None)(data)
    profile_df = data.data.varm["CellTopicProfile"]
    profile = np.asarray(profile_df)
    eps, threshold = 1e-6, 0.05
    expected = 0
    for i in range(profile.shape[1]):
        others = [j for j in range(profile.shape[1]) if j != i]
        log_fc = (np.log(profile[:, i] + eps)
                  - np.log(profile[:, others].mean(1) + eps))
        expected = np.maximum(expected, log_fc > threshold)
    FilterGenesMarker(ct_profile_channel="CellTopicProfile",
                      threshold=threshold)(data)
    assert data.data.n_vars == int(np.sum(expected)) > 0


def test_filter_genes_marker_gini(data):
    from dance_tpu.transforms import CellGiottoTopicProfile, FilterGenesMarkerGini
    CellGiottoTopicProfile(ct_select="auto", ct_key="cell_type")(data)
    n_before = data.data.n_vars
    FilterGenesMarkerGini()(data)
    assert 0 < data.data.n_vars <= n_before


def test_hvg_mean_disp(data):
    from dance_tpu.transforms import HighlyVariableGenesLogarithmizedByMeanAndDisp
    import dance_tpu.sc as sc
    adata = data.data
    sc.pp.normalize_total(adata, target_sum=1e4)
    sc.pp.log1p(adata)
    n_before = adata.n_vars
    HighlyVariableGenesLogarithmizedByMeanAndDisp(
        min_mean=0.01, max_mean=8, min_disp=0.2)(data)
    assert 0 < data.data.n_vars <= n_before


def test_filter_cells_common_mod():
    from dance_tpu.transforms import FilterCellsCommonMod
    rng = np.random.default_rng(0)
    m1 = AnnData(rng.random((10, 4), dtype=np.float32))
    m2 = AnnData(rng.random((8, 3), dtype=np.float32))
    m1.obs_names = [f"c{i}" for i in range(10)]
    m2.obs_names = [f"c{i}" for i in range(2, 10)]
    data = Data(MuData({"mod1": m1, "mod2": m2}), train_size="all")
    FilterCellsCommonMod(mod1="mod1", mod2="mod2")(data)
    assert data.data.mod["mod1"].n_obs == data.data.mod["mod2"].n_obs == 8


# --------------------------------------------------------------------------
# feature.cell
# --------------------------------------------------------------------------

def test_cell_svd_matches_sklearn(data):
    from sklearn.decomposition import TruncatedSVD

    from dance_tpu.transforms import CellSVD
    X = _X(data).copy()
    CellSVD(n_components=5)(data)
    ours = np.asarray(data.data.obsm["CellSVD"])
    ref = TruncatedSVD(n_components=5, random_state=0).fit_transform(X)
    np.testing.assert_allclose(np.abs(ours), np.abs(ref), rtol=5e-2, atol=5e-2)


def test_weighted_feature_svd(data):
    from dance_tpu.transforms import WeightedFeatureSVD
    from dance_tpu.utils.matrix import normalize
    X = _X(data).copy()
    WeightedFeatureSVD(n_components=5, split_name="train")(data)
    feat = np.asarray(data.data.obsm["WeightedFeatureSVD"])
    gene = np.asarray(data.data.varm["WeightedFeatureSVD"])
    # cell features are row-normalized-expression-weighted gene embeddings
    np.testing.assert_allclose(feat, normalize(X, mode="normalize", axis=1) @ gene,
                               rtol=1e-3, atol=1e-3)


def test_cell_sparse_pca(data):
    from dance_tpu.transforms import CellSparsePCA
    CellSparsePCA(n_components=5)(data)
    feat = np.asarray(data.data.obsm["CellSparsePCA"])
    assert feat.shape == (data.data.n_obs, 5) and np.isfinite(feat).all()
    assert feat.std() > 0


def test_feature_cell_placeholder(data):
    from dance_tpu.transforms import FeatureCellPlaceHolder
    FeatureCellPlaceHolder(n_components=5)(data)
    # placeholder passes raw features through (identity on X)
    feat = np.asarray(data.data.obsm["FeatureCellPlaceHolder"])
    np.testing.assert_allclose(feat, _X(data), rtol=1e-6)


def test_gauss_rand_proj(data):
    from dance_tpu.transforms import GaussRandProjFeature
    GaussRandProjFeature(n_components=16, seed=0)(data)
    feat = np.asarray(data.data.obsm["GaussRandProjFeature"])
    assert feat.shape == (60, 16)
    # Johnson-Lindenstrauss: projected pairwise distances track the originals
    from scipy.spatial.distance import pdist
    d0, d1 = pdist(_X(data)), pdist(feat)
    corr = np.corrcoef(d0, d1)[0, 1]
    assert corr > 0.6, corr


def test_batch_feature():
    from dance_tpu.transforms import BatchFeature
    rng = np.random.default_rng(0)
    m1 = AnnData(rng.random((20, 6), dtype=np.float32),
                 obs={"batch": rng.choice(["x", "y"], 20)})
    data = Data(MuData({"mod1": m1}), train_size="all")
    BatchFeature(mod="mod1")(data)
    feat = data.data.mod["mod1"].obsm["batch_features"]
    assert np.asarray(feat).shape[0] == 20


def test_scn_feature(data):
    import pandas as pd

    from dance_tpu.transforms import SCNFeature
    onehot = pd.get_dummies(pd.Series(np.asarray(data.data.obs["cell_type"]))
                            ).astype(np.float32)
    onehot.index = data.data.obs_names
    data.data.obsm["cell_type"] = onehot
    SCNFeature(num_top_genes=5, num_top_gene_pairs=10, split_name="train")(data)
    feat = np.asarray(data.data.obsm["SCNFeature"])
    assert feat.shape[0] == data.data.n_obs
    assert set(np.unique(feat)).issubset({0.0, 1.0})  # gene-pair indicators


# --------------------------------------------------------------------------
# feature.spatial
# --------------------------------------------------------------------------

def _spatial_data(n=40, g=12, seed=0):
    rng = np.random.default_rng(seed)
    adata = AnnData(rng.poisson(2.0, (n, g)).astype(np.float32))
    adata.obsm["spatial"] = rng.random((n, 2)).astype(np.float32) * 100
    adata.obsm["spatial_pixel"] = adata.obsm["spatial"]
    adata.uns["image"] = rng.random((120, 120, 3)).astype(np.float32)
    return Data(adata, train_size="all")


def test_sme_feature():
    from dance_tpu.transforms import SMEFeature
    data = _spatial_data()
    X = np.asarray(data.data.X).copy()
    # SMEGraph-style dense similarity as the neighbor-weight channel
    rng = np.random.default_rng(0)
    w = rng.random((40, 40)).astype(np.float32)
    data.data.obsp["SMEGraph"] = (w + w.T) / 2
    SMEFeature(n_neighbors=3, n_components=5)(data)
    feat = np.asarray(data.data.obsm["SMEFeature"])
    assert feat.shape == (40, 5) and np.isfinite(feat).all()
    # X unchanged (feature lands in obsm)
    np.testing.assert_array_equal(np.asarray(data.data.X), X)


def test_spatialide_feature():
    from dance_tpu.transforms import SpatialIDEFeature
    data = _spatial_data()
    SpatialIDEFeature()(data)
    feat = np.asarray(data.data.obsm["SpatialIDEFeature"])
    assert feat.shape[0] == 40 and np.isfinite(feat).all()


# --------------------------------------------------------------------------
# graph builders
# --------------------------------------------------------------------------

def test_cell_feature_bipartite_graph(data):
    from dance_tpu.transforms.graph import CellFeatureBipartiteGraph
    X = _X(data).copy()
    CellFeatureBipartiteGraph(cell_feature_channel=None)(data)
    g = data.data.uns["g"]  # reference stores the bipartite graph under "g"
    n_cells, n_genes = X.shape
    assert g.num_nodes == n_cells + n_genes
    # edge count: one per nonzero (both directions)
    assert g.adj.nnz >= 2 * (X > 0).sum()


def test_pca_cell_feature_graph(data):
    from dance_tpu.transforms.graph import PCACellFeatureGraph
    PCACellFeatureGraph(n_components=5, split_name="train")(data)
    g = data.data.uns["PCACellFeatureGraph"]
    feats = g.ndata["features"]
    assert feats.shape[1] == 5


def test_feature_feature_graph(data):
    from dance_tpu.transforms.graph import FeatureFeatureGraph
    X = _X(data).copy()
    FeatureFeatureGraph(threshold=0.3)(data)
    g = data.data.uns["FeatureFeatureGraph"]
    assert g.num_nodes == X.shape[1]
    corr = np.corrcoef(X.T)
    # every edge corresponds to |corr| >= threshold (plus self loops)
    adj = g.adj.tocoo()
    off = adj.row != adj.col
    assert np.all(np.abs(corr[adj.row[off], adj.col[off]]) >= 0.3 - 1e-6)


def test_stagate_graph():
    from dance_tpu.transforms.graph import StagateGraph
    data = _spatial_data()
    StagateGraph("radius", radius=20)(data)
    mat = data.data.obsp["StagateGraph"]
    xy = np.asarray(data.data.obsm["spatial"])
    d = np.linalg.norm(xy[:, None] - xy[None, :], axis=-1)
    ref = (d <= 20).astype(float)
    np.fill_diagonal(ref, 0.0)  # radius graph excludes self edges
    got = np.asarray(mat.todense() > 0).astype(float)
    np.testing.assert_array_equal(got, ref)


def test_spagcn_graphs():
    from dance_tpu.transforms.graph import SpaGCNGraph, SpaGCNGraph2D
    data = _spatial_data()
    data.data.obsm["spatial_pixel"] = np.asarray(data.data.obsm["spatial"])
    SpaGCNGraph(alpha=1, beta=49)(data)
    g1 = data.data.obsp["SpaGCNGraph"]
    SpaGCNGraph2D()(data)
    g2 = np.asarray(data.data.obsp["SpaGCNGraph2D"])
    g1 = np.asarray(g1)
    assert g1.shape == g2.shape == (40, 40)
    assert np.isfinite(g1).all()
    # 2D variant = pure spatial euclidean distances
    xy = np.asarray(data.data.obsm["spatial_pixel"])
    d = np.linalg.norm(xy[:, None] - xy[None, :], axis=-1)
    np.testing.assert_allclose(g2, d, rtol=1e-3, atol=1e-3)


def test_sme_graph():
    from dance_tpu.transforms.graph import SMEGraph
    data = _spatial_data()
    rng = np.random.default_rng(0)
    data.data.obsm["MorphologyFeatureCNN"] = rng.random((40, 5)).astype(np.float32)
    data.data.obsm["CellPCA"] = rng.random((40, 5)).astype(np.float32)
    SMEGraph()(data)
    w = data.data.obsp["SMEGraph"]
    assert w.shape == (40, 40)
    assert np.isfinite(np.asarray(w if isinstance(w, np.ndarray) else w.todense())).all()


def test_dst_graph():
    from dance_tpu.transforms.graph import DSTGraph
    rng = np.random.default_rng(0)
    adata = AnnData(rng.random((30, 10), dtype=np.float32))
    data = Data(adata, full_split_name="ref")
    pseudo = Data(AnnData(rng.random((20, 10), dtype=np.float32)))
    data.append(pseudo, mode="new_split", new_split_name="test", join="outer")
    DSTGraph(k_filter=5, num_cc=5, ref_split="ref", inf_split="test")(data)
    g = data.data.obsp["DSTGraph"]
    assert g.shape == (50, 50)


def test_heteronet_graph(data):
    from dance_tpu.transforms.graph import HeteronetGraph
    HeteronetGraph(knn_num=5)(data)
    g = data.data.uns["HeteronetGraph"]
    assert g.num_nodes == data.data.n_obs
    assert (np.diff(g.adj.indptr) > 0).all()  # every cell has neighbors


def test_scmognn_graph():
    from dance_tpu.transforms.graph import ScMoGNNGraph
    rng = np.random.default_rng(0)
    m1 = AnnData(rng.poisson(1.0, (25, 10)).astype(np.float32))
    m2 = AnnData(rng.poisson(1.0, (25, 6)).astype(np.float32))
    data = Data(MuData({"mod1": m1, "mod2": m2}), train_size=20)
    ScMoGNNGraph()(data)
    g = data.data.uns["ScMoGNNGraph"]
    assert g.num_nodes == 25 + 10  # cells + mod1 features


# --------------------------------------------------------------------------
# misc / split
# --------------------------------------------------------------------------

def test_remove_split(data):
    from dance_tpu.transforms import RemoveSplit
    assert "test" in data._split_idx_dict or data.get_split_idx("test") is not None
    n_total = data.data.n_obs
    n_train = len(data.get_split_idx("train"))
    RemoveSplit(split_name="test")(data)
    assert data.data.n_obs == n_train < n_total


def test_align_mod():
    from dance_tpu.transforms import AlignMod
    rng = np.random.default_rng(0)
    m1 = AnnData(rng.random((10, 4), dtype=np.float32))
    m2 = AnnData(rng.random((10, 3), dtype=np.float32))
    m1.obs_names = [f"c{i}" for i in range(10)]
    m2.obs_names = [f"c{i}" for i in reversed(range(10))]
    data = Data(MuData({"mod1": m1, "mod2": m2}), train_size="all")
    AlignMod()(data)
    assert list(data.data.mod["mod1"].obs_names) == list(
        data.data.mod["mod2"].obs_names)


def test_gene_holdout(data):
    from dance_tpu.transforms import GeneHoldout
    GeneHoldout(n_top=3, batch_size=8)(data)
    targets = data.data.uns["targets"]
    predictors = data.data.uns["predictors"]
    assert len(targets) == len(predictors)
    covered = sorted({g for t in targets for g in t})
    assert covered == list(range(data.data.n_vars))  # every gene is a target once
    for t, p in zip(targets, predictors):
        assert len(t) <= 8 and len(p) > 0
        assert not set(t) & set(p)  # predictors exclude their targets

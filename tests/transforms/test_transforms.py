"""Transform catalog tests: numeric parity vs sklearn + registry contract."""

import numpy as np
import pytest
import scipy.sparse as sp

from dance_tpu.data import AnnData, Data


@pytest.fixture
def data():
    rng = np.random.default_rng(0)
    X = rng.poisson(2.0, size=(60, 30)).astype(np.float32)
    X[X < 1] = 0
    adata = AnnData(X=X, obs={"cell_type": rng.choice(list("abc"), 60),
                              "batch": rng.choice([0, 1], 60)})
    return Data(adata, train_size=40)


def test_registry_scopes():
    import dance_tpu.transforms  # noqa: F401 — triggers registration
    from dance_tpu.registry import REGISTRY
    keys = set(REGISTRY.children("preprocessor", non_leaf_node=False))
    for expected in [
            "preprocessor.misc.Compose", "preprocessor.misc.SetConfig",
            "preprocessor.normalize.NormalizeTotal", "preprocessor.normalize.Log1P",
            "preprocessor.normalize.ScTransform",
            "preprocessor.filter.cell.FilterCellsScanpy",
            "preprocessor.filter.gene.FilterGenesTopK",
            "preprocessor.filter.gene.HighlyVariableGenesRawCount",
            "preprocessor.feature.cell.WeightedFeaturePCA",
            "preprocessor.feature.cell.CellPCA", "preprocessor.feature.gene.GeneStats",
            "preprocessor.graph.cell.CellFeatureGraph",
            "preprocessor.graph.cell.NeighborGraph",
            "preprocessor.graph.spatial.SpaGCNGraph",
            "preprocessor.graph.reference.DSTGraph",
            "preprocessor.split.entry.CellwiseMaskData",
            "preprocessor.pseudobulk.PseudoMixture",
            "preprocessor.interface.AnnDataTransform",
    ]:
        assert expected in keys, f"missing {expected}"


def test_normalize_total_log1p(data):
    from dance_tpu.transforms import NormalizeTotalLog1P
    before = data.data.X.copy()
    NormalizeTotalLog1P(target_sum=1e4, max_fraction=1.0)(data)
    after = data.data.X
    expected = np.log1p(before / before.sum(1, keepdims=True) * 1e4)
    np.testing.assert_allclose(after, expected, rtol=1e-5, atol=1e-5)


def test_filter_cells_genes_parity(data):
    from dance_tpu.transforms import FilterCellsScanpy, FilterGenesScanpy
    X = data.data.X.copy()
    keep_genes = (X > 0).sum(0) >= 5
    FilterGenesScanpy(min_cells=5)(data)
    assert data.shape[1] == keep_genes.sum()
    keep_cells = data.data.X.sum(1) >= 10
    FilterCellsScanpy(min_counts=10)(data)
    assert data.shape[0] == keep_cells.sum()
    # split reindexed
    assert max(data.train_idx, default=0) < data.shape[0]


def test_filter_genes_topk(data):
    from dance_tpu.transforms import FilterGenesTopK
    X = data.data.X.copy()
    cv = np.nan_to_num(X.std(0) / X.mean(0))
    top10 = set(np.asarray(data.data.var_names)[np.argsort(cv)[-10:]])
    FilterGenesTopK(num_genes=10, mode="cv")(data)
    assert set(data.data.var_names) == top10


def test_filter_genes_match(data):
    from dance_tpu.transforms import FilterGenesMatch
    data.data.var_names = [f"MT-{i}" if i < 5 else f"g{i}" for i in range(30)]
    FilterGenesMatch(prefixes=["MT-"])(data)
    assert data.shape[1] == 25


def test_hvg_seurat(data):
    from dance_tpu.transforms import (HighlyVariableGenesLogarithmizedByTopGenes,
                                      NormalizeTotalLog1P)
    NormalizeTotalLog1P(max_fraction=1.0)(data)
    HighlyVariableGenesLogarithmizedByTopGenes(n_top_genes=15)(data)
    assert data.shape[1] == 15


def test_hvg_seurat_v3(data):
    from dance_tpu.transforms import HighlyVariableGenesRawCount
    HighlyVariableGenesRawCount(n_top_genes=12)(data)
    assert data.shape[1] == 12


def test_weighted_feature_pca(data):
    from dance_tpu.transforms import WeightedFeaturePCA
    WeightedFeaturePCA(n_components=8, split_name="train")(data)
    assert data.data.obsm["WeightedFeaturePCA"].shape == (60, 8)
    assert data.data.varm["WeightedFeaturePCA"].shape == (30, 8)


def test_cell_pca_parity(data):
    from sklearn.decomposition import PCA

    from dance_tpu.transforms import CellPCA
    X = np.asarray(data.data.X, dtype=np.float32)
    CellPCA(n_components=5)(data)
    ref = PCA(n_components=5, svd_solver="full").fit_transform(X)
    np.testing.assert_allclose(np.abs(data.data.obsm["CellPCA"]), np.abs(ref), rtol=1e-2,
                               atol=1e-2)


def test_sctransform(data):
    from dance_tpu.transforms import ScTransform
    ScTransform(min_cells=1)(data)
    X = data.data.X
    assert np.isfinite(X).all()
    assert abs(float(np.mean(X))) < 1.0  # residuals roughly centered


def test_gene_stats(data):
    from dance_tpu.transforms import GeneStats
    GeneStats(split_name=None)(data)
    df = data.data.varm["GeneStats"]
    assert "mu" in df.columns and "alpha" in df.columns
    np.testing.assert_allclose(df["mean_all"], data.data.X.mean(0), rtol=1e-5)


def test_mask_data(data):
    from dance_tpu.transforms import CellwiseMaskData, MaskData
    data.set_config(feature_channel=None, feature_channel_type="X",
                    label_channel=None, label_channel_type="X")
    CellwiseMaskData(mask_rate=0.2, seed=0)(data)
    tm = data.data.layers["train_mask"]
    vm = data.data.layers["valid_mask"]
    assert not (tm & vm).any()
    X = np.asarray(data.data.X)
    assert (X[~tm] > 0).all()  # only positive entries masked
    MaskData(mask_rate=0.1, seed=0)(data)
    assert data.data.layers["train_mask"].mean() > 0.8


def test_compose_setconfig(data):
    from dance_tpu.transforms import Compose, Log1P, NormalizeTotal, SetConfig
    pipe = Compose(
        NormalizeTotal(target_sum=100, max_fraction=1.0),
        Log1P(),
        SetConfig({"feature_channel": None, "feature_channel_type": "X",
                   "label_channel": "cell_type", "label_channel_type": "obs"}),
    )
    assert len(pipe.hexdigest()) == 32
    pipe(data)
    x, y = data.get_train_data()
    assert x.shape == (40, 30)
    assert y.shape == (40,)


def test_save_update_raw(data):
    from dance_tpu.transforms import Log1P, SaveRaw, UpdateRaw
    orig = np.asarray(data.data.X).copy()
    SaveRaw()(data)
    Log1P()(data)
    assert not np.allclose(data.data.X, orig)
    UpdateRaw()(data)
    np.testing.assert_allclose(data.data.X, orig)


def test_cell_feature_graph(data):
    from dance_tpu.graph import Graph
    from dance_tpu.transforms.graph import PCACellFeatureGraph
    data.set_config(feature_channel=None, feature_channel_type="X",
                    label_channel="cell_type", label_channel_type="obs")
    PCACellFeatureGraph(n_components=8, split_name="train")(data)
    g = data.data.uns["PCACellFeatureGraph"]
    assert isinstance(g, Graph)
    assert g.num_nodes == 60 + 30
    assert g.ndata["features"].shape == (90, 8)
    dg = g.to_device()
    assert dg.adj.shape == (90, 90)


def test_neighbor_graph(data):
    from dance_tpu.transforms import CellPCA
    from dance_tpu.transforms.graph import NeighborGraph
    CellPCA(n_components=5)(data)
    NeighborGraph(n_neighbors=4)(data)
    adj = data.data.obsp["NeighborGraph"]
    assert adj.shape == (60, 60)
    assert adj.nnz > 0


def test_pseudo_mixture(data):
    from dance_tpu.transforms import PseudoMixture
    data.data.obs["cellType"] = data.data.obs["cell_type"]
    data.set_split_idx("ref", list(range(40)))
    PseudoMixture(n_pseudo=20, ct_key="cellType", in_split_name="ref")(data)
    assert len(data.get_split_idx("pseudo")) == 20
    assert data.shape[0] == 80
    portions = data.data.obsm.get("cell_type_portion")


def test_cell_topic_profile(data):
    from dance_tpu.transforms import CellTopicProfile
    data.data.obs["cellType"] = data.data.obs["cell_type"]
    CellTopicProfile(ct_key="cellType", method="mean")(data)
    prof = data.data.varm["CellTopicProfile"]
    assert prof.shape == (30, 3)


def test_anndata_transform_string(data):
    from dance_tpu.transforms import AnnDataTransform
    t = AnnDataTransform("sc.pp.log1p")
    before = np.asarray(data.data.X).copy()
    t(data)
    np.testing.assert_allclose(data.data.X, np.log1p(before), rtol=1e-5)


def test_column_sum_normalize_batchwise(data):
    from dance_tpu.transforms import ColumnSumNormalize
    d = data.copy()
    ColumnSumNormalize(axis=1, mode="normalize", batch_key="batch")(d)
    X = np.asarray(d.data.X)
    np.testing.assert_allclose(X.sum(1), np.ones(len(X)), rtol=1e-4)
    # split-wise standardize
    d2 = data.copy()
    ColumnSumNormalize(axis=0, mode="standardize", split_names=["train"])(d2)
    Xtr = np.asarray(d2.data.X)[np.asarray(d2.train_idx)]
    assert abs(Xtr.mean()) < 1e-4


def test_seed_determinism(data):
    """Same seed → bitwise-identical predictions (production determinism)."""
    from dance_tpu.datasets.synthetic import annotation_data
    from dance_tpu.modules.single_modality.cell_type_annotation import ACTINN
    preds = []
    for _ in range(2):
        dd = annotation_data(n_cells=150, n_genes=60, n_types=3, seed=3)
        m = ACTINN(hidden_dims=(16,), random_seed=7)
        m.preprocess(dd)
        x, y = dd.get_train_data()
        m.fit(x, y, num_epochs=10, seed=7)
        preds.append(m.predict_proba(dd.get_x("test")))
    np.testing.assert_array_equal(preds[0], preds[1])


def test_morphology_feature_cnn_trains():
    """Trained morphology encoder adapts to the tiles (loss decreases vs random)."""
    import numpy as np

    from dance_tpu.data import AnnData, Data
    from dance_tpu.transforms import MorphologyFeatureCNN, SetConfig

    rng = np.random.default_rng(0)
    n = 40
    image = rng.random((300, 300, 3)).astype(np.float32)
    xy = rng.integers(30, 270, (n, 2)).astype(np.float32)
    adata = AnnData(rng.random((n, 10), dtype=np.float32))
    adata.obsm["spatial_pixel"] = xy
    adata.uns["image"] = image
    data = Data(adata, train_size="all")
    MorphologyFeatureCNN(n_components=8, train_epochs=10)(data)
    feat = data.data.obsm["MorphologyFeatureCNN"]
    assert feat.shape == (n, 8)
    assert np.isfinite(feat).all()

    # train_epochs=0 keeps the random-feature fallback and differs
    data2 = Data(adata.copy(), train_size="all")
    MorphologyFeatureCNN(n_components=8, train_epochs=0)(data2)
    assert not np.allclose(feat, data2.data.obsm["MorphologyFeatureCNN"])


def test_morphology_feature_cnn_downstream_ari():
    """Quality delta vs the reference's pretrained CNN (spatial_feature.py:19).

    The reference extracts torchvision-resnet50 features whose value is that
    spots from the same tissue domain cluster together. No pretrained weights
    exist offline, so this quantifies the replacement's downstream quality
    directly: on a synthetic slide whose domains differ by patch texture,
    kmeans on the trained self-supervised features must (a) recover the
    domains well (ARI floor) and (b) beat the untrained random-kernel
    fallback — the null the self-supervised training must improve on.
    """
    import numpy as np

    from dance_tpu.data import AnnData, Data
    from dance_tpu.ops.cluster import kmeans
    from dance_tpu.transforms import MorphologyFeatureCNN
    from dance_tpu.utils.metrics import ari

    rng = np.random.default_rng(0)
    n_dom, per_dom = 3, 30
    # 3 horizontal texture bands: smooth / vertical stripes / checker
    h = w = 312
    image = np.empty((h, w, 3), np.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    band = np.minimum(yy * n_dom // h, n_dom - 1)
    tex = np.stack([
        0.5 + 0.05 * rng.standard_normal((h, w)),
        0.5 + 0.45 * np.sin(xx / 2.0),
        0.5 + 0.45 * np.sign(np.sin(xx / 4.0) * np.sin(yy / 4.0)),
    ])
    base = np.take_along_axis(tex, band[None], axis=0)[0]
    for c in range(3):
        image[..., c] = np.clip(base + 0.02 * rng.standard_normal((h, w)), 0, 1)

    labels = np.repeat(np.arange(n_dom), per_dom)
    ys = np.concatenate([
        rng.integers(d * h // n_dom + 20, (d + 1) * h // n_dom - 20, per_dom)
        for d in range(n_dom)])
    xs = rng.integers(20, w - 20, n_dom * per_dom)
    # crop convention is image[first-coord, second-coord] (row, col) — same
    # as the reference's _crop_and_process (spatial_feature.py:70)
    xy = np.stack([ys, xs], 1).astype(np.float32)

    def extract(train_epochs, seed=0):
        adata = AnnData(rng.random((len(labels), 10), dtype=np.float32))
        adata.obsm["spatial_pixel"] = xy
        adata.uns["image"] = image
        data = Data(adata, train_size="all")
        MorphologyFeatureCNN(n_components=8, train_epochs=train_epochs,
                             random_state=seed)(data)
        return np.asarray(data.data.obsm["MorphologyFeatureCNN"], np.float32)

    def cluster_ari(feat):
        import jax.numpy as jnp
        pred = np.asarray(kmeans(jnp.asarray(feat), n_dom, seed=0).labels)
        return ari(labels, pred)

    ari_trained = cluster_ari(extract(train_epochs=30))
    ari_random = cluster_ari(extract(train_epochs=0))
    assert ari_trained >= 0.6, f"trained morphology ARI too low: {ari_trained}"
    assert ari_trained >= ari_random, (
        f"self-supervised training failed to beat the random-kernel null: "
        f"{ari_trained} < {ari_random}")


def test_sctransform_glm_pipeline():
    """GLM-flavor ScTransform (reference pipeline): theta_ml matches a
    brute-force NB MLE, residuals follow the reference's clip/zero rules,
    and the _sct annotations land in var/obs."""
    import numpy as np
    from scipy.optimize import minimize_scalar
    from scipy.special import gammaln

    from dance_tpu.data import AnnData
    from dance_tpu.data.base import Data
    from dance_tpu.transforms.normalize import ScTransform, gmean, theta_ml

    rng = np.random.default_rng(0)
    n, g = 200, 80
    libs = rng.lognormal(0, 0.4, n)
    base = rng.gamma(2.0, 0.5, g)
    theta_true = rng.uniform(2, 20, g)
    mu = libs[:, None] * base[None, :]
    counts = rng.negative_binomial(
        theta_true[None, :].repeat(n, 0),
        theta_true / (theta_true + mu)).astype(np.float64)

    # theta_ml matches the reference's Newton loop (normalize.py:500)
    from scipy.special import polygamma, psi

    def ref_theta_ml(y, m, limit=10):
        nn = y.size
        eps = np.finfo(float).eps ** 0.25
        t0 = nn / sum((y / m - 1) ** 2)
        de, it = 1, 0
        while it + 1 < limit and abs(de) > eps:
            it += 1
            t0 = abs(t0)
            i = sum(-polygamma(1, t0 + y) + polygamma(1, t0) - 1 / t0
                    + 2 / (m + t0) - (y + t0) / (m + t0) ** 2)
            de = sum(psi(t0 + y) - psi(t0) + np.log(t0) + 1
                     - np.log(t0 + m) - (y + t0) / (m + t0)) / i
            t0 += de
        return max(t0, 0)

    for j in (0, 3, 11):
        y0, m0 = counts[:, j], mu[:, j]
        ref = ref_theta_ml(y0, m0)
        assert abs(theta_ml(y0, m0) - ref) / max(ref, 1e-6) < 5e-2, j

    # and on a well-identified gene it agrees with the brute-force MLE too
    yb = rng.negative_binomial(5.0, 5.0 / (5.0 + np.full(500, 8.0))).astype(float)
    mb = np.full(500, 8.0)

    def nll(th):
        return -(gammaln(th + yb) - gammaln(th) - gammaln(yb + 1)
                 + th * np.log(th) + yb * np.log(mb)
                 - (th + yb) * np.log(th + mb)).sum()

    brute = minimize_scalar(nll, bounds=(0.01, 1000), method="bounded").x
    assert abs(theta_ml(yb, mb) - brute) / brute < 2e-2

    # reference gmean convention: zeros contribute 0 to the log-sum
    x = np.array([[0.0, 2.0], [3.0, 0.0]])
    np.testing.assert_allclose(
        gmean(x, axis=0, eps=1),
        np.exp(np.log(np.where(x != 0, x + 1, 1)).mean(0)) - 1)

    d = Data(AnnData(X=counts.copy()))
    ScTransform(min_cells=1, n_genes=None)(d)
    X = d.data.X
    assert X.shape == counts.shape
    assert np.isfinite(X).all()
    assert (X >= 0).all()  # negatives zeroed (normalize.py:419)
    assert X.max() <= np.sqrt(n / 30) + 1e-6
    assert (X[counts == 0] == 0).all()  # residuals only at nonzero entries
    for col in ("Intercept_sct", "log_umi_sct", "theta_sct",
                "log10_gmean_sct"):
        assert col in d.data.var
    assert "log_umi_sct" in d.data.obs
    th = np.asarray(d.data.var["theta_sct"], float)
    assert np.nanmedian(th) == pytest.approx(np.median(theta_true), rel=1.0)


def test_sctransform_r_bridge_with_mock_rpy2(data, monkeypatch):
    """The rpy2 bridge's Python-side protocol, driven by a mock R session:
    package-ensure calls, genes x cells handover, the reference R code
    (normalize.py:159-166 incl. min_cells interpolation), and the transposed
    write-back of RNA@data into data.data.X."""
    import sys
    import types

    from dance_tpu.transforms.normalize import ScTransformR

    x_before = np.asarray(data.data.X, np.float64).copy()
    state = {"assigned": None, "code": [], "libs": []}

    class _R:
        def __call__(self, code):
            state["code"].append(code)
            if code.startswith("library("):
                state["libs"].append(code)
                return None
            if code.strip().startswith("as.matrix"):
                # mock SCTransform output: log1p of the handed-over counts
                return np.log1p(state["assigned"])
            return None

        def assign(self, name, value):
            assert name == "counts"
            state["assigned"] = np.asarray(value)

    class _LocalConverter:
        def __init__(self, *a):
            pass

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    robjects = types.ModuleType("rpy2.robjects")
    robjects.r = _R()
    robjects.default_converter = object()
    packages = types.ModuleType("rpy2.robjects.packages")
    packages.importr = lambda name: types.SimpleNamespace(
        chooseCRANmirror=lambda ind: None, install_packages=lambda p: None,
        install=lambda p: None)
    packages.isinstalled = lambda name: True
    numpy2ri = types.ModuleType("rpy2.robjects.numpy2ri")
    numpy2ri.converter = object()
    conversion = types.ModuleType("rpy2.robjects.conversion")
    conversion.localconverter = _LocalConverter
    class _Converter:  # default_converter + numpy2ri.converter must be addable
        def __add__(self, other):
            return self

    robjects.default_converter = _Converter()

    rpy2 = types.ModuleType("rpy2")
    for name, mod in [("rpy2", rpy2), ("rpy2.robjects", robjects),
                      ("rpy2.robjects.packages", packages),
                      ("rpy2.robjects.numpy2ri", numpy2ri),
                      ("rpy2.robjects.conversion", conversion)]:
        monkeypatch.setitem(sys.modules, name, mod)

    ScTransformR(min_cells=3)(data)

    # R saw genes x cells; X came back cells x genes, SCTransform'd
    assert state["assigned"].shape == (x_before.shape[1], x_before.shape[0])
    np.testing.assert_allclose(np.asarray(data.data.X),
                               np.log1p(x_before.T).T.astype(np.float32),
                               rtol=1e-6)
    protocol = "\n".join(state["code"])
    assert "SCTransform" in protocol and "min_cells=3" in protocol
    assert "as.Seurat(sce" in protocol
    assert any("library(Seurat)" in c for c in state["libs"])
    assert any("library(SingleCellExperiment)" in c for c in state["libs"])

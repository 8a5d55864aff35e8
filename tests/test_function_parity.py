"""Function-level head-to-head parity vs the reference implementation.

The model-level harness lives in benchmarks/parity.py; these tests compare
the REFERENCE'S OWN module-level helper functions (imported from
/root/reference through the same shim) against this framework's
reference-named ports on identical inputs — numeric evidence that the
helper surface is faithful, not just present.
"""

import os
import sys

import numpy as np
import pytest

BENCH_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         "benchmarks")
if BENCH_DIR not in sys.path:
    sys.path.insert(0, BENCH_DIR)

refshim = pytest.importorskip("refshim")
if not os.path.exists(refshim.REFERENCE_PATH):
    pytest.skip("reference checkout not available", allow_module_level=True)


@pytest.fixture(scope="module")
def counts():
    rng = np.random.default_rng(0)
    return rng.poisson(2.0, (80, 40)).astype(np.float32)


def test_gene_selection_matches_reference(counts):
    ref_fn = refshim.import_ref("dance.transforms.preprocess", "geneSelection")
    from dance_tpu.transforms.preprocess import geneSelection
    ref = ref_fn(counts.astype(np.float64), verbose=0)
    ours = geneSelection(counts.astype(np.float64), verbose=0)
    assert (np.asarray(ref) == np.asarray(ours)).all()


def test_row_normalize_matches_reference(counts):
    import scipy.sparse as sp
    ref_fn = refshim.import_ref("dance.transforms.preprocess", "row_normalize")
    from dance_tpu.transforms.preprocess import row_normalize
    m = sp.csr_matrix(counts)
    np.testing.assert_allclose(np.asarray(ref_fn(m).todense()),
                               np.asarray(row_normalize(m).todense()),
                               atol=1e-12)


def test_svd_and_gene_sorting_match_reference(counts):
    import pandas as pd
    ref_svd = refshim.import_ref("dance.transforms.preprocess", "SVD")
    ref_sort = refshim.import_ref("dance.transforms.preprocess", "sortGenes")
    ref_top = refshim.import_ref("dance.transforms.preprocess", "selectTopGenes")
    from dance_tpu.transforms.preprocess import SVD, selectTopGenes, sortGenes
    u_r, v_r, d_r = ref_svd(counts.astype(np.float64), 5)
    u_o, v_o, d_o = SVD(counts.astype(np.float64), 5)
    np.testing.assert_allclose(d_r, d_o, atol=1e-8)
    np.testing.assert_allclose(np.abs(u_r), np.abs(u_o), atol=1e-6)
    load = pd.DataFrame(np.asarray(u_o) * d_o[None, :],
                        index=[f"g{i}" for i in range(u_o.shape[0])])
    assert (ref_sort(load, 0, 6) == sortGenes(load, 0, 6)).all()
    assert set(ref_top(load, [0, 1], 10, 12)) == set(
        selectTopGenes(load, [0, 1], 10, 12))


def test_magic_impute_fast_matches_reference(counts):
    ref_markov = refshim.import_ref(
        "dance.modules.single_modality.imputation.magic", "compute_markov")
    ref_impute = refshim.import_ref(
        "dance.modules.single_modality.imputation.magic", "impute_fast")
    from dance_tpu.modules.single_modality.imputation.magic import (
        compute_markov, impute_fast)
    # continuous coordinates: integer counts produce tied distances whose
    # k-sets differ between sklearn's and the device's top-k tie-breaking
    pca = np.random.default_rng(3).normal(size=(80, 8))
    L_ref = ref_markov(pca, k=10, epsilon=1, ka=4)
    L_ours = compute_markov(pca, k=10, epsilon=1, ka=4)
    # same kNN structure -> same Markov matrix, modulo f32-vs-f64 distance
    # rounding at autotune tie boundaries (rescales a handful of rows)
    dense_r = np.asarray(L_ref.todense())
    dense_o = np.asarray(L_ours.todense())
    assert (np.abs(dense_r - dense_o) < 1e-4).mean() > 0.97
    assert np.abs(dense_r - dense_o).max() < 0.25
    assert np.allclose(dense_o.sum(1), 1.0, atol=1e-5)
    out_ref, _ = ref_impute(counts.astype(np.float64), L_ref, 3,
                            rescale_percent=0)
    out_ours, _ = impute_fast(counts, L_ref, 3, rescale_percent=0)
    np.testing.assert_allclose(np.asarray(out_ref), out_ours, rtol=2e-3,
                               atol=2e-3)


def test_scgnn2_utilities_match_reference(counts):
    ref_knn = refshim.import_ref(
        "dance.modules.single_modality.imputation.scgnn2",
        "calculateKNNgraphDistanceMatrixStatsSingleThread")
    ref_trim = refshim.import_ref(
        "dance.modules.single_modality.imputation.scgnn2", "trimClustering")
    ref_regu = refshim.import_ref(
        "dance.modules.single_modality.imputation.scgnn2",
        "generateCelltypeRegu")
    from dance_tpu.modules.single_modality.imputation.scgnn2 import (
        calculateKNNgraphDistanceMatrixStatsSingleThread, generateCelltypeRegu,
        trimClustering)
    x = counts[:30, :10].astype(np.float64)
    ref_edges = ref_knn(x, k=5)
    our_edges = calculateKNNgraphDistanceMatrixStatsSingleThread(x, k=5)
    assert [(u, v) for u, v, _ in ref_edges] == [(u, v) for u, v, _ in our_edges]
    np.testing.assert_allclose([w for *_, w in ref_edges],
                               [w for *_, w in our_edges], rtol=1e-8)
    labels = [0] * 8 + [1] * 2 + [2] * 5
    assert ref_trim(list(labels), 3, 30) == trimClustering(list(labels), 3, 30)
    np.testing.assert_array_equal(ref_regu(labels), generateCelltypeRegu(labels))


def test_module_losses_match_reference_torch(counts):
    import torch
    ref_mod = "dance.modules.multi_modality.joint_embedding.scmvae"
    ref_bce = refshim.import_ref(ref_mod, "binary_cross_entropy")
    ref_nb = refshim.import_ref(ref_mod, "NB_loss")
    ref_mse = refshim.import_ref(ref_mod, "mse_loss")
    ref_poisson = refshim.import_ref(ref_mod, "poisson_loss")
    from dance_tpu.utils.loss import (NB_loss, binary_cross_entropy, mse_loss,
                                      poisson_loss)
    rng = np.random.default_rng(1)
    y = rng.poisson(2.0, (6, 9)).astype(np.float32)
    mu = (rng.random((6, 9)) + 0.5).astype(np.float32)
    th = (rng.random(9) + 0.5).astype(np.float32)
    p = 1.0 / (1.0 + np.exp(-mu))
    yt, mt, tt, pt = map(torch.tensor, (y, mu, th, p))
    np.testing.assert_allclose(ref_bce(pt, (yt > 0).float()).numpy(),
                               np.asarray(binary_cross_entropy(p, (y > 0))),
                               rtol=1e-5)
    np.testing.assert_allclose(ref_nb(yt, mt, tt).numpy(),
                               np.asarray(NB_loss(y, mu, th)), rtol=2e-3)
    np.testing.assert_allclose(ref_mse(yt, mt).numpy(),
                               np.asarray(mse_loss(y, mu)), rtol=1e-5)
    np.testing.assert_allclose(ref_poisson(yt, mt).numpy(),
                               np.asarray(poisson_loss(y, mu)), rtol=1e-4)


def test_flatten_dict_matches_reference():
    ref_fn = refshim.import_ref("dance.pipeline", "flatten_dict")
    from dance_tpu.pipeline import flatten_dict
    d = {"a": {"x": 1, "y": {"z": 2}}, "b": 3}
    assert ref_fn(d) == flatten_dict(d)
    assert ref_fn(d, sep=".") == flatten_dict(d, sep=".")


def test_babel_activations_match_reference_torch():
    import torch
    ref_mod = "dance.modules.multi_modality.predict_modality.babel"
    RefExp = refshim.import_ref(ref_mod, "Exp")
    RefCS = refshim.import_ref(ref_mod, "ClippedSoftplus")
    from dance_tpu.modules.multi_modality.predict_modality.babel import (
        ClippedSoftplus, Exp)
    x = np.linspace(-10, 25, 40).astype(np.float32)
    np.testing.assert_allclose(RefExp()(torch.tensor(x)).numpy(),
                               np.asarray(Exp()(x)), rtol=1e-5)
    np.testing.assert_allclose(RefCS()(torch.tensor(x)).numpy(),
                               np.asarray(ClippedSoftplus()(x)), rtol=1e-4,
                               atol=1e-4)


def test_dstg_link_chain_matches_reference():
    """The CCA->MNN->filter edge chain produces the same link set as the
    reference's (KD-tree + pandas) implementation."""
    import pandas as pd
    ref_clg = refshim.import_ref("dance.transforms.graph.dstg_graph",
                                 "construct_link_graph")
    from dance_tpu.transforms.graph.dstg_graph import construct_link_graph
    rng = np.random.default_rng(0)
    # both spot sets must exceed the reference's hard-coded k=30+1 kNN
    n_genes, n_ref, n_inf = 120, 45, 40
    base = rng.random((n_genes, 5))
    p_df = pd.DataFrame(base @ rng.dirichlet(np.ones(5), n_ref).T
                        + 0.01 * rng.random((n_genes, n_ref)),
                        index=[f"g{i}" for i in range(n_genes)],
                        columns=range(n_ref))
    r_df = pd.DataFrame(base @ rng.dirichlet(np.ones(5), n_inf).T
                        + 0.01 * rng.random((n_genes, n_inf)),
                        index=[f"g{i}" for i in range(n_genes)],
                        columns=range(n_ref, n_ref + n_inf))
    g_ref = ref_clg(p_df.copy(), r_df.copy(), k_filter=20, num_cc=10)
    g_our = construct_link_graph(p_df.copy(), r_df.copy(), k_filter=20,
                                 num_cc=10)
    ref_set = set(map(tuple, g_ref.to_numpy().astype(int)))
    our_set = set(map(tuple, g_our.to_numpy().astype(int)))
    # SVD sign/rounding at the CCA stage can flip a few marginal edges
    overlap = len(ref_set & our_set) / max(len(ref_set | our_set), 1)
    assert overlap > 0.9, f"link-edge overlap too low: {overlap}"


def test_efnst_weights_match_reference(counts):
    ref_gene = refshim.import_ref(
        "dance.modules.spatial.spatial_domain.EfNST", "cal_gene_weight")
    ref_spatial = refshim.import_ref(
        "dance.modules.spatial.spatial_domain.EfNST", "cal_spatial_weight")
    from dance_tpu.modules.spatial.spatial_domain.EfNST import (
        cal_gene_weight, cal_spatial_weight)
    gw_ref = ref_gene(counts.astype(np.float64), n_components=10)
    gw_our = cal_gene_weight(counts.astype(np.float64), n_components=10)
    # PCA sign conventions differ; cosine distances of embeddings agree
    np.testing.assert_allclose(gw_ref, gw_our, atol=5e-2)
    coords = np.random.default_rng(2).normal(size=(60, 2)) * 10
    sw_ref = ref_spatial(coords, spatial_k=8)
    sw_our = cal_spatial_weight(coords, spatial_k=8)
    agree = (sw_ref == sw_our).mean()
    assert agree > 0.995, f"spatial weight agreement {agree}"


def test_cardref_matches_reference_quality():
    """Our CARDref recovers mixture proportions at least as well as the
    reference's (whose Lambda never updates — card.py:60,92)."""
    ref_card = refshim.import_ref(
        "dance.modules.spatial.cell_type_deconvo.card", "CARDref")
    from dance_tpu.modules.spatial.cell_type_deconvo.card import CARDref
    rng = np.random.default_rng(0)
    m_genes, n_spots, k = 60, 40, 3
    U = rng.random((m_genes, k)) * 3
    V_true = rng.dirichlet(np.ones(k), n_spots)
    X = (U @ V_true.T) + 0.05 * rng.random((m_genes, n_spots))
    kwargs = dict(Xinput=X, U=U, W=None, phi=0.0, max_iter=100, epsilon=1e-10,
                  V=np.abs(rng.random((n_spots, k))), b=np.zeros((k, 1)),
                  sigma_e2=0.1, Lambda=np.full(k, 10.0))
    pred_ref, _ = ref_card(**{key: (v.copy() if hasattr(v, "copy") else v)
                              for key, v in kwargs.items()})
    pred_our, _ = CARDref(**kwargs)
    err_ref = np.abs(pred_ref - V_true).mean()
    err_our = np.abs(pred_our - V_true).mean()
    assert err_our <= err_ref + 0.01, (err_our, err_ref)
    assert err_our < 0.1


def test_celltypist_lr_matches_reference(monkeypatch):
    # the reference passes multi_class='ovr', removed in this sklearn; shim
    # the name in ITS module namespace with a factory dropping the dead kwarg
    import importlib

    from sklearn.linear_model import LogisticRegression
    ref_lr = refshim.import_ref(
        "dance.modules.single_modality.cell_type_annotation.celltypist",
        "LRClassifier_celltypist")
    ref_mod = importlib.import_module(
        "dance.modules.single_modality.cell_type_annotation.celltypist")

    def factory(*args, multi_class=None, **kwargs):
        return LogisticRegression(*args, **kwargs)

    monkeypatch.setattr(ref_mod, "LogisticRegression", factory)
    from dance_tpu.modules.single_modality.cell_type_annotation.celltypist import (
        LRClassifier_celltypist)
    rng = np.random.default_rng(0)
    labels = np.array(["A"] * 20 + ["B"] * 20)
    x = np.concatenate([rng.random((20, 5)), rng.random((20, 5)) + 1.5])
    clf_ref = ref_lr(x, labels, C=1.0, solver=None, max_iter=200, n_jobs=1)
    clf_our = LRClassifier_celltypist(x, labels, C=1.0, solver=None,
                                      max_iter=200, n_jobs=1)
    assert (clf_ref.predict(x) == clf_our.predict(x)).all()


def test_scmm_preprocessing_matches_reference(counts):
    import torch
    ref_mod = "dance.modules.multi_modality.predict_modality.scmm"
    ref_prot = refshim.import_ref(ref_mod, "protein_preprocessing")
    ref_atac = refshim.import_ref(ref_mod, "atac_preprocessing")
    from dance_tpu.modules.multi_modality.predict_modality.scmm import (
        atac_preprocessing, protein_preprocessing)
    t = counts[:20, :12] + 0.0
    np.testing.assert_allclose(ref_prot(torch.tensor(t)).numpy(),
                               np.asarray(protein_preprocessing(t)), rtol=1e-5)
    np.testing.assert_allclose(
        ref_atac(torch.tensor(t.copy())).numpy(),
        np.asarray(atac_preprocessing(t.copy())), rtol=1e-6)

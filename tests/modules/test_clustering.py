"""End-to-end clustering family tests on synthetic data (ARI sanity)."""

import numpy as np
import pytest

from dance_tpu.datasets.synthetic import clustering_data


@pytest.fixture(scope="module")
def data():
    return clustering_data(n_cells=200, n_genes=100, n_types=3, seed=0)


def _prep(data, model_cls, **kwargs):
    d = data.copy()
    model_cls.preprocessing_pipeline(**kwargs)(d)
    return d


def test_scdeepcluster_e2e(data):
    from dance_tpu.modules.single_modality.clustering import ScDeepCluster
    d = _prep(data, ScDeepCluster)
    inputs, y = d.get_train_data()
    model = ScDeepCluster(input_dim=inputs[0].shape[1], z_dim=8, encodeLayer=[64, 32],
                          decodeLayer=[32, 64], sigma=1.0, seed=0)
    model.fit(inputs, y, n_clusters=3, epochs=5, pt_epochs=40, batch_size=64,
              pt_batch_size=64)
    ari = model.score(None, y)
    assert ari > 0.5, f"scDeepCluster ARI too low: {ari}"


def test_scdcc_e2e(data):
    from dance_tpu.modules.single_modality.clustering import ScDCC
    d = _prep(data, ScDCC, n_top_genes=80)
    inputs, y = d.get_train_data()
    # constraints from a few labeled pairs
    rng = np.random.default_rng(0)
    idx = rng.choice(len(y), 60, replace=False)
    ml1, ml2, cl1, cl2 = [], [], [], []
    for a in idx[:30]:
        for b in idx[30:]:
            (ml1 if y[a] == y[b] else cl1).append(a)
            (ml2 if y[a] == y[b] else cl2).append(b)
    model = ScDCC(input_dim=inputs[0].shape[1], z_dim=8, n_clusters=3,
                  encodeLayer=[64], decodeLayer=[64], sigma=1.5, seed=0)
    model.fit(inputs, y, ml_ind1=ml1[:100], ml_ind2=ml2[:100], cl_ind1=cl1[:100],
              cl_ind2=cl2[:100], epochs=5, pt_epochs=40, batch_size=64,
              pt_batch_size=64)
    ari = model.score(None, y)
    assert ari > 0.5, f"scDCC ARI too low: {ari}"


def test_graphsc_e2e(data):
    from dance_tpu.modules.single_modality.clustering import GraphSC
    d = _prep(data, GraphSC, n_top_genes=80, n_components=20)
    g, y = d.get_train_data()
    model = GraphSC(in_feats=20, hidden_dim=64, hidden_1=32, n_clusters=3,
                    cluster_method="kmeans", seed=0)
    model.fit(g, y, epochs=30, lr=1e-3)
    ari = model.score(None, y)
    assert ari > 0.3, f"graph-sc ARI too low: {ari}"


def test_sctag_e2e(data):
    from dance_tpu.modules.single_modality.clustering import ScTAG
    d = _prep(data, ScTAG, n_top_genes=80, n_components=20, n_neighbors=10)
    inputs, y = d.get_train_data()
    model = ScTAG(n_clusters=3, k=2, hidden_dim=32, latent_dim=8, dec_dim=[32, 64],
                  seed=0)
    model.fit(inputs, y, epochs=20, pretrain_epochs=60)
    ari = model.score(None, y)
    assert ari > 0.5, f"scTAG ARI too low: {ari}"


def test_scdsc_e2e(data):
    from dance_tpu.modules.single_modality.clustering import ScDSC
    d = _prep(data, ScDSC, n_top_genes=80, n_neighbors=15)
    inputs, y = d.get_train_data()
    model = ScDSC(n_input=inputs[1].shape[1], n_clusters=3, sigma=0.5,
                  n_enc_1=64, n_enc_2=32, n_enc_3=32, n_dec_1=32, n_dec_2=32,
                  n_dec_3=64, n_z1=32, n_z2=16, n_z3=8, seed=0)
    model.fit(inputs, y, epochs=60, pt_epochs=150)
    ari = model.score(None, y)
    # the heavy scDSC preprocessing caps separability on this tiny synthetic set
    # (KMeans directly on the pretrained AE embedding reaches ~0.47)
    assert ari > 0.3, f"scDSC ARI too low: {ari}"


def test_graphsc_bsr_training(data):
    """GraphSC trains through the Pallas BSR path (differentiable SpMM)."""
    from dance_tpu.modules.single_modality.clustering import GraphSC
    model = GraphSC(n_clusters=3, hidden_dim=32, hidden_1=16, seed=0)
    d = data.copy()
    model.preprocessing_pipeline(n_top_genes=40, n_components=16)(d)
    g = d.get_x("train")
    y = d.get_y("train")
    model.fit(g, y, epochs=30, lr=1e-3, use_bsr=True)
    ari = model.score(None, y)
    assert ari > 0.25, f"BSR-path GraphSC ARI too low: {ari}"


def test_graphsc_bsr_mean():
    """GraphSC's Pallas path now supports mean aggregation (paired degrees)."""
    import numpy as np

    from dance_tpu.datasets.synthetic import clustering_data
    from dance_tpu.modules.single_modality.clustering import GraphSC

    d = clustering_data(n_cells=120, n_genes=40, n_types=3, seed=0)
    model = GraphSC(agg="mean", n_clusters=3, seed=0)
    model.preprocess(d)
    g, y = d.get_train_data()
    model.fit(g, y, epochs=30, use_bsr=True)
    pred = model.predict()
    assert pred.shape[0] == 120


def test_sctag_bsr_parity(data):
    """ScTAG's Pallas BSR TAGConv path agrees with the CSR segment path."""
    from sklearn.metrics import adjusted_rand_score

    from dance_tpu.modules.single_modality.clustering import ScTAG
    from dance_tpu.ops.neighbors import knn_graph

    rng = np.random.default_rng(0)
    n, d, k = 150, 30, 3
    centers = rng.random((k, d)) * 4
    y = rng.integers(0, k, n)
    x = (centers[y] + rng.random((n, d))).astype(np.float32)
    x_raw = np.maximum(np.round(x * 3), 0)
    nc = x_raw.sum(1) + 1
    adj = knn_graph(x, 10)
    preds = {}
    for use_bsr in (False, True):
        model = ScTAG(n_clusters=k, hidden_dim=32, latent_dim=8, seed=0)
        model.fit((adj, x, x_raw, nc), y, epochs=5, pretrain_epochs=10,
                  use_bsr=use_bsr)
        preds[use_bsr] = model.predict()
    assert adjusted_rand_score(y, preds[True]) > 0.9
    assert adjusted_rand_score(preds[False], preds[True]) > 0.9


def test_scdsc_bsr_parity(data):
    """ScDSC's 7-layer GCN stack trains through the Pallas BSR path."""
    from sklearn.metrics import adjusted_rand_score

    from dance_tpu.modules.single_modality.clustering import ScDSC
    from dance_tpu.ops.neighbors import knn_graph

    rng = np.random.default_rng(0)
    n, d, k = 150, 30, 3
    centers = rng.random((k, d)) * 4
    y = rng.integers(0, k, n)
    x = (centers[y] + rng.random((n, d))).astype(np.float32)
    x_raw = np.maximum(np.round(x * 3), 0)
    nc = x_raw.sum(1) + 1
    adj = knn_graph(x, 10)
    preds = {}
    for use_bsr in (False, True):
        model = ScDSC(n_clusters=k, n_input=d, seed=0)
        model.fit((adj, x, x_raw, nc), y, epochs=12, pt_epochs=10,
                  use_bsr=use_bsr)
        preds[use_bsr] = model.predict()
    assert adjusted_rand_score(y, preds[True]) > 0.9
    assert adjusted_rand_score(preds[False], preds[True]) > 0.9

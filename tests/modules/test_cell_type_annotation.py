"""End-to-end tests for the cell-type annotation family on synthetic data."""

import numpy as np
import pytest

from dance_tpu.datasets.synthetic import annotation_data


@pytest.fixture(scope="module")
def data():
    return annotation_data(n_cells=300, n_genes=100, n_types=3, seed=0)


def test_actinn_e2e(data):
    from dance_tpu.modules.single_modality.cell_type_annotation import ACTINN
    d = data.copy()
    model = ACTINN(hidden_dims=(32, 16), lambd=0.01, random_seed=0)
    model.preprocess(d)
    x_train, y_train = d.get_train_data(return_type="numpy")
    model.fit(x_train, y_train, num_epochs=20, batch_size=64, lr=0.01, seed=0)
    x_test, y_test = d.get_test_data(return_type="numpy")
    acc = model.score(x_test, y_test)
    assert acc > 0.85, f"ACTINN acc too low: {acc}"


def test_svm_e2e(data):
    from dance_tpu.modules.single_modality.cell_type_annotation import SVM
    d = data.copy()
    model = SVM(None, random_state=0)
    model.preprocess(d, n_components=20)
    x_train, y_train = d.get_train_data(return_type="numpy")
    model.fit(x_train, y_train.argmax(1))
    x_test, y_test = d.get_test_data(return_type="numpy")
    acc = model.score(x_test, y_test)
    assert acc > 0.85, f"SVM acc too low: {acc}"


def test_celltypist_e2e(data):
    from dance_tpu.modules.single_modality.cell_type_annotation import Celltypist
    d = data.copy()
    model = Celltypist(majority_voting=False)
    model.preprocess(d)
    x_train, y_train = d.get_train_data(return_type="numpy")
    model.fit(x_train, y_train.argmax(1), max_iter=200)
    x_test, y_test = d.get_test_data(return_type="numpy")
    acc = model.score(x_test, y_test)
    assert acc > 0.85, f"Celltypist acc too low: {acc}"


def test_singlecellnet_e2e(data):
    from dance_tpu.modules.single_modality.cell_type_annotation import SingleCellNet
    d = data.copy()
    model = SingleCellNet(num_trees=50)
    model.preprocess(d, num_top_genes=8, num_top_gene_pairs=15)
    x_train, y_train = d.get_train_data(return_type="numpy")
    model.fit(x_train, y_train.argmax(1))
    x_test, y_test = d.get_test_data(return_type="numpy")
    acc = model.score(x_test, y_test)
    assert acc > 0.7, f"SingleCellNet acc too low: {acc}"


def test_scdeepsort_e2e(data):
    from dance_tpu.modules.single_modality.cell_type_annotation import ScDeepSort
    d = data.copy()
    model = ScDeepSort(dim_in=16, dim_hid=32, num_layers=1, species="mouse",
                       tissue="Spleen", seed=0)
    model.preprocess(d, n_components=16)
    y_train = d.get_y("train")
    graph = d.data.uns["PCACellFeatureGraph"]
    n_genes = graph.info["num_genes"]
    # train on the subgraph of genes + train cells (reference example flow)
    train_idx = np.concatenate([np.arange(n_genes),
                                n_genes + np.asarray(d.train_idx)])
    g_train = graph.subgraph(train_idx)
    g_train.info = {"num_genes": n_genes, "num_cells": len(d.train_idx)}
    model.fit(g_train, y_train.argmax(1), epochs=60, lr=1e-2)
    test_idx = np.concatenate([np.arange(n_genes), n_genes + np.asarray(d.test_idx)])
    g_test = graph.subgraph(test_idx)
    g_test.info = {"num_genes": n_genes, "num_cells": len(d.test_idx)}
    y_test = d.get_y("test")
    pred = model.predict(g_test, unsure_rate=2.0)
    acc = (y_test.argmax(1) == pred).mean()
    assert acc > 0.8, f"scDeepSort acc too low: {acc}"


def test_scheteronet_e2e(data):
    from dance_tpu.graph import Graph
    from dance_tpu.modules.single_modality.cell_type_annotation import scHeteroNet
    from dance_tpu.transforms.graph import HeteronetGraph
    d = data.copy()
    HeteronetGraph(knn_num=5)(d)
    g = d.data.uns["HeteronetGraph"]
    y = d.data.obsm["cell_type"].to_numpy().argmax(1)
    model = scHeteroNet(hidden_channels=32, num_layers=2, seed=0)
    model.fit(g, y, x_raw=np.asarray(d.data.X), epochs=120,
              train_idx=np.asarray(d.train_idx))
    test_idx = np.asarray(d.test_idx)
    acc = (model.predict(idx=test_idx) == y[test_idx]).mean()
    assert acc > 0.8, f"scHeteroNet acc too low: {acc}"
    # OOD scores exist and are finite
    scores = model.detect(node_idx=test_idx)
    assert np.isfinite(scores).all()


def test_scheteronet_ood_measures(data):
    """OOD evaluation: held-out novel cell type scores below in-distribution."""
    from dance_tpu.modules.single_modality.cell_type_annotation import scHeteroNet
    from dance_tpu.transforms.graph import HeteronetGraph
    from dance_tpu.utils.metrics import ood_measures
    d = data.copy()
    HeteronetGraph(knn_num=5)(d)
    g = d.data.uns["HeteronetGraph"]
    y = d.data.obsm["cell_type"].to_numpy().argmax(1)
    # treat class 2 as OOD: train only on classes 0/1
    train_idx = np.asarray([i for i in d.train_idx if y[i] != 2])
    model = scHeteroNet(hidden_channels=32, num_layers=2, seed=0)
    model.fit(g, y, x_raw=np.asarray(d.data.X), epochs=120, train_idx=train_idx)
    test_idx = np.asarray(d.test_idx)
    ind = test_idx[y[test_idx] != 2]
    ood = test_idx[y[test_idx] == 2]
    auroc, aupr, fpr95 = model.evaluate_ood(ind, ood)
    assert 0 <= aupr <= 1 and 0 <= fpr95 <= 1
    assert auroc > 0.7, f"OOD AUROC too low: {auroc}"
    # sanity: metric math on synthetic separable scores
    a, p, f = ood_measures(np.full(50, 5.0), np.full(50, -5.0))
    assert a == 1.0 and f == 0.0


def test_scheteronet_bsr_parity(data):
    """scHeteroNet's HetConv stack trains through the Pallas BSR path; both
    the classifier output and the propagated OOD scores agree with the CSR
    path in the caller's node order."""
    from dance_tpu.modules.single_modality.cell_type_annotation import scHeteroNet
    from dance_tpu.transforms.graph import HeteronetGraph
    d = data.copy()
    HeteronetGraph(knn_num=5)(d)
    g = d.data.uns["HeteronetGraph"]
    y = d.data.obsm["cell_type"].to_numpy().argmax(1)
    test_idx = np.asarray(d.test_idx)
    out = {}
    for use_bsr in (False, True):
        model = scHeteroNet(hidden_channels=32, num_layers=2, seed=0)
        model.fit(g, y, x_raw=np.asarray(d.data.X), epochs=60,
                  train_idx=np.asarray(d.train_idx), use_bsr=use_bsr)
        out[use_bsr] = (model.predict(idx=test_idx), model.detect())
    acc = (out[True][0] == y[test_idx]).mean()
    assert acc > 0.8, f"BSR-path scHeteroNet acc too low: {acc}"
    agree = (out[False][0] == out[True][0]).mean()
    assert agree > 0.9, f"BSR/CSR prediction agreement too low: {agree}"
    assert np.isfinite(out[True][1]).all()

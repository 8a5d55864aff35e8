"""Imputation family e2e: masked-entry recovery must beat the zero baseline."""

import numpy as np
import pytest

from dance_tpu.datasets.synthetic import imputation_data


@pytest.fixture(scope="module")
def data():
    return imputation_data(n_cells=200, n_genes=100, seed=0)


def _masked_rmse(truth, imputed, valid_mask):
    diff = (truth - imputed)[valid_mask]
    return float(np.sqrt((diff ** 2).mean()))


def test_magic_e2e(data):
    from dance_tpu.modules.single_modality.imputation import MAGIC
    d = data.copy()
    MAGIC.preprocessing_pipeline(mask_rate=0.1, seed=0)(d)
    (x, mask), (y, _) = d.get_x(), d.get_y()
    valid = d.data.layers["valid_mask"]
    model = MAGIC(t=3, k=10)
    model.fit(x, mask=mask)
    imputed = model.predict()
    rmse = _masked_rmse(y, imputed, valid)
    base = _masked_rmse(y, np.zeros_like(y), valid)
    assert rmse < base, f"MAGIC rmse {rmse} not better than zero baseline {base}"


def test_deepimpute_e2e(data):
    from dance_tpu.modules.single_modality.imputation import DeepImpute
    d = data.copy()
    DeepImpute.preprocessing_pipeline(min_cells=0.05, sub_outputdim=40, n_top=5,
                                      mask_rate=0.1, seed=1)(d)
    x, x_raw, targets, predictors, train_mask, valid_mask, test_mask = d.get_x()
    y = d.get_y()[0]
    model = DeepImpute(predictors, targets, sub_outputdim=40, hidden_dim=64, seed=1)
    model.fit(x, x, mask=train_mask, n_epochs=60, batch_size=64)
    imputed = model.predict(x, mask=train_mask)
    vm = valid_mask.astype(bool)
    rmse = _masked_rmse(y, imputed, vm)
    base = _masked_rmse(y, np.zeros_like(y), vm)
    assert rmse < base, f"DeepImpute rmse {rmse} vs zero baseline {base}"


def test_graphsci_e2e(data):
    from dance_tpu.modules.single_modality.imputation import GraphSCI
    d = data.copy()
    GraphSCI.preprocessing_pipeline(min_cells=0.05, mask_rate=0.1, seed=0)(d)
    g, x, mask = d.get_x()
    y = d.get_y()[0]
    model = GraphSCI(num_cells=x.shape[0], num_genes=x.shape[1], n_epochs=80, seed=0)
    model.fit(g, x, np.expm1(x), mask=mask)
    imputed = model.predict(mask=mask)
    vm = d.data.layers["valid_mask"].astype(bool)
    rmse = _masked_rmse(y, imputed, vm)
    base = _masked_rmse(y, np.zeros_like(y), vm)
    assert rmse < base, f"GraphSCI rmse {rmse} vs zero baseline {base}"


def test_scgnn2_e2e(data):
    from dance_tpu.modules.single_modality.imputation import ScGNN2
    d = data.copy()
    ScGNN2.preprocessing_pipeline(min_cells=0.05, mask_rate=0.1, seed=0)(d)
    x, mask = d.get_x()
    y = d.get_y()[0]
    model = ScGNN2(total_epoch=2, feature_epoch=60, graph_epoch=30, n_clusters=3,
                   hidden=(128, 32), seed=0)
    model.fit(x, mask=mask)
    imputed = model.predict()
    vm = d.data.layers["valid_mask"].astype(bool)
    rmse = _masked_rmse(y, imputed, vm)
    base = _masked_rmse(y, np.zeros_like(y), vm)
    assert rmse < base, f"ScGNN2 rmse {rmse} vs zero baseline {base}"


def test_deepimpute_reference_protocol(data):
    """reference_protocol=True: torch-init subnets, 90/10 split, plain-MSE
    val, never-resetting patience, accumulated-gradient steps — must run the
    full fit/predict path and still beat the zero baseline."""
    from dance_tpu.modules.single_modality.imputation import DeepImpute
    d = data.copy()
    DeepImpute.preprocessing_pipeline(min_cells=0.05, sub_outputdim=40, n_top=5,
                                      mask_rate=0.1, seed=1)(d)
    x, x_raw, targets, predictors, train_mask, valid_mask, test_mask = d.get_x()
    y = d.get_y()[0]
    model = DeepImpute(predictors, targets, sub_outputdim=40, hidden_dim=64,
                       seed=1, reference_protocol=True)
    model.fit(x, x, mask=train_mask, n_epochs=30, batch_size=64, patience=10)
    imputed = model.predict(x, mask=train_mask)
    vm = valid_mask.astype(bool)
    rmse = _masked_rmse(y, imputed, vm)
    base = _masked_rmse(y, np.zeros_like(y), vm)
    assert rmse < base, f"DeepImpute(refproto) rmse {rmse} vs baseline {base}"


def test_scgnn2_reference_protocol(data):
    """reference_protocol=True: sampled-VGAE embedding (std=exp(logvar)),
    torch-init ReLU-head AEs, L1-dominated cluster loss — full EM must run."""
    from dance_tpu.modules.single_modality.imputation import ScGNN2
    d = data.copy()
    ScGNN2.preprocessing_pipeline(min_cells=0.05, mask_rate=0.1, seed=0)(d)
    x, mask = d.get_x()
    model = ScGNN2(total_epoch=1, feature_epoch=30, graph_epoch=15,
                   cluster_epoch=15, n_clusters=3, hidden=(128, 32), seed=0,
                   reference_protocol=True)
    model.fit(x, mask=mask)
    imputed = model.predict()
    assert np.isfinite(imputed).all()

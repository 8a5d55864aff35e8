"""DANCE 2.0 pipeline/params search for DeepImpute imputation.

Parity: reference examples/tuning/imputation_deepimpute/main.py (same step-2 pipeline
sweep + step-3 params protocol on the framework-native SweepRunner).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from _tuning_common import gen_kwargs, tuning_main

from _utils import imputation_data
from dance_tpu.modules.single_modality.imputation import DeepImpute


def _masked_rmse(truth, imputed, valid_mask):
    diff = (np.asarray(truth) - np.asarray(imputed))[valid_mask]
    return float(np.sqrt((diff ** 2).mean()))


def evaluate(planer, trial_cfg, seed, params_mode):
    data = imputation_data(n_cells=200, n_genes=100, seed=seed)
    planer.generate(**gen_kwargs(trial_cfg, params_mode)).functional(data)
    DeepImpute.preprocessing_pipeline(min_cells=0.05, sub_outputdim=40, n_top=5,
                                      mask_rate=0.1, seed=seed)(data)
    x, x_raw, targets, predictors, train_mask, valid_mask, test_mask = data.get_x()
    y = data.get_y()[0]
    model = DeepImpute(predictors, targets, sub_outputdim=40, hidden_dim=64, seed=seed)
    model.fit(x, x, mask=train_mask, n_epochs=40, batch_size=64)
    imputed = model.predict(x, mask=train_mask)
    vm = data.data.layers["valid_mask"].astype(bool)
    return {"rmse": _masked_rmse(y, imputed, vm)}


if __name__ == "__main__":
    tuning_main(evaluate, "rmse", os.path.dirname(os.path.abspath(__file__)),
                maximize=False)

"""DANCE 2.0 pipeline/params search for MAGIC imputation.

Parity: reference examples/tuning/imputation_magic/main.py (same step-2 pipeline
sweep + step-3 params protocol on the framework-native SweepRunner).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from _tuning_common import gen_kwargs, tuning_main

from _utils import imputation_data
from dance_tpu.modules.single_modality.imputation import MAGIC


def _masked_rmse(truth, imputed, valid_mask):
    diff = (np.asarray(truth) - np.asarray(imputed))[valid_mask]
    return float(np.sqrt((diff ** 2).mean()))


def evaluate(planer, trial_cfg, seed, params_mode):
    data = imputation_data(n_cells=200, n_genes=100, seed=seed)
    planer.generate(**gen_kwargs(trial_cfg, params_mode)).functional(data)
    MAGIC.preprocessing_pipeline(mask_rate=0.1, seed=seed)(data)
    (x, mask), (y, _) = data.get_x(), data.get_y()
    model = MAGIC(t=3, k=10)
    model.fit(x, mask=mask)
    imputed = model.predict()
    vm = data.data.layers["valid_mask"].astype(bool)
    return {"rmse": _masked_rmse(y, imputed, vm)}


if __name__ == "__main__":
    tuning_main(evaluate, "rmse", os.path.dirname(os.path.abspath(__file__)),
                maximize=False)

"""DANCE 2.0 pipeline/params search for SingleCellNet annotation.

Parity: reference examples/tuning/cta_singlecellnet/main.py (same step-2 pipeline
sweep + step-3 params protocol on the framework-native SweepRunner).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from _tuning_common import gen_kwargs, tuning_main

from _utils import annotation_data
from dance_tpu.modules.single_modality.cell_type_annotation import SingleCellNet


def evaluate(planer, trial_cfg, seed, params_mode):
    data = annotation_data(n_cells=250, n_genes=80, n_types=3, seed=seed)
    planer.generate(**gen_kwargs(trial_cfg, params_mode)).functional(data)
    model = SingleCellNet(num_trees=50)
    model.preprocess(data, num_top_genes=8, num_top_gene_pairs=15)
    x_tr, y_tr = data.get_train_data(return_type="numpy")
    x_te, y_te = data.get_test_data(return_type="numpy")
    model.fit(x_tr, y_tr.argmax(1))
    return {"acc": model.score(x_tr, y_tr), "test_acc": model.score(x_te, y_te)}


if __name__ == "__main__":
    tuning_main(evaluate, "test_acc", os.path.dirname(os.path.abspath(__file__)))

"""DANCE 2.0 pipeline/params search for scHeteroNet annotation.

Parity: reference examples/tuning/cta_scheteronet/main.py (same step-2 pipeline
sweep + step-3 params protocol on the framework-native SweepRunner).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from _tuning_common import gen_kwargs, tuning_main

from _utils import annotation_data
from dance_tpu.modules.single_modality.cell_type_annotation import scHeteroNet
from dance_tpu.transforms.graph import HeteronetGraph


def evaluate(planer, trial_cfg, seed, params_mode):
    data = annotation_data(n_cells=250, n_genes=80, n_types=3, seed=seed)
    planer.generate(**gen_kwargs(trial_cfg, params_mode)).functional(data)
    HeteronetGraph(knn_num=5)(data)
    g = data.data.uns["HeteronetGraph"]
    y = data.data.obsm["cell_type"].to_numpy().argmax(1)
    model = scHeteroNet(hidden_channels=32, num_layers=2, seed=seed)
    model.fit(g, y, x_raw=np.asarray(data.data.X), epochs=80,
              train_idx=np.asarray(data.train_idx))
    te = np.asarray(data.test_idx)
    acc = float((model.predict(idx=te) == y[te]).mean())
    return {"acc": acc, "test_acc": acc}


if __name__ == "__main__":
    tuning_main(evaluate, "test_acc", os.path.dirname(os.path.abspath(__file__)))

"""DANCE 2.0 pipeline/params search for scDeepSort annotation.

Parity: reference examples/tuning/cta_scdeepsort/main.py (same step-2 pipeline
sweep + step-3 params protocol on the framework-native SweepRunner).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from _tuning_common import gen_kwargs, tuning_main

from _utils import annotation_data
from dance_tpu.modules.single_modality.cell_type_annotation import ScDeepSort


def evaluate(planer, trial_cfg, seed, params_mode):
    data = annotation_data(n_cells=250, n_genes=80, n_types=3, seed=seed)
    planer.generate(**gen_kwargs(trial_cfg, params_mode)).functional(data)
    model = ScDeepSort(dim_in=16, dim_hid=32, num_layers=1, species="mouse",
                       tissue="Spleen", seed=seed)
    model.preprocess(data, n_components=16)
    graph = data.data.uns["PCACellFeatureGraph"]
    n_genes = graph.info["num_genes"]
    y_tr = data.get_y("train")
    tr_idx = np.concatenate([np.arange(n_genes), n_genes + np.asarray(data.train_idx)])
    g_tr = graph.subgraph(tr_idx)
    g_tr.info = {"num_genes": n_genes, "num_cells": len(data.train_idx)}
    model.fit(g_tr, y_tr.argmax(1), epochs=40, lr=1e-2)
    te_idx = np.concatenate([np.arange(n_genes), n_genes + np.asarray(data.test_idx)])
    g_te = graph.subgraph(te_idx)
    g_te.info = {"num_genes": n_genes, "num_cells": len(data.test_idx)}
    y_te = data.get_y("test")
    acc = float((y_te.argmax(1) == model.predict(g_te, unsure_rate=2.0)).mean())
    return {"acc": acc, "test_acc": acc}


if __name__ == "__main__":
    tuning_main(evaluate, "test_acc", os.path.dirname(os.path.abspath(__file__)))

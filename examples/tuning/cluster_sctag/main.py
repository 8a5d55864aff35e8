"""DANCE 2.0 pipeline/params search for scTAG.

Parity: reference examples/tuning/cluster_sctag/main.py (same step-2 pipeline
sweep + step-3 params protocol on the framework-native SweepRunner).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from _tuning_common import gen_kwargs, tuning_main

from _utils import clustering_data
from dance_tpu.modules.single_modality.clustering import ScTAG


def evaluate(planer, trial_cfg, seed, params_mode):
    data = clustering_data(n_cells=200, n_genes=100, n_types=3, seed=seed)
    planer.generate(**gen_kwargs(trial_cfg, params_mode)).functional(data)
    ScTAG.preprocessing_pipeline(n_top_genes=80, n_components=20, n_neighbors=10)(data)
    inputs, y = data.get_train_data()
    model = ScTAG(n_clusters=3, k=2, hidden_dim=32, latent_dim=8, dec_dim=[32, 64], seed=seed)
    model.fit(inputs, y, epochs=15, pretrain_epochs=40)
    return {"ari": model.score(None, y)}


if __name__ == "__main__":
    tuning_main(evaluate, "ari", os.path.dirname(os.path.abspath(__file__)))

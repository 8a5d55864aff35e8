"""DANCE 2.0 pipeline/params search for scDeepCluster.

Parity: reference examples/tuning/cluster_scdeepcluster/main.py (same step-2 pipeline
sweep + step-3 params protocol on the framework-native SweepRunner).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from _tuning_common import gen_kwargs, tuning_main

from _utils import clustering_data
from dance_tpu.modules.single_modality.clustering import ScDeepCluster


def evaluate(planer, trial_cfg, seed, params_mode):
    data = clustering_data(n_cells=200, n_genes=100, n_types=3, seed=seed)
    planer.generate(**gen_kwargs(trial_cfg, params_mode)).functional(data)
    ScDeepCluster.preprocessing_pipeline()(data)
    inputs, y = data.get_train_data()
    model = ScDeepCluster(input_dim=inputs[0].shape[1], z_dim=8, encodeLayer=[64, 32], decodeLayer=[32, 64], sigma=1.0, seed=seed)
    model.fit(inputs, y, n_clusters=3, epochs=3, pt_epochs=30, batch_size=64, pt_batch_size=64)
    return {"ari": model.score(None, y)}


if __name__ == "__main__":
    tuning_main(evaluate, "ari", os.path.dirname(os.path.abspath(__file__)))

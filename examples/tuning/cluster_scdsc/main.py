"""DANCE 2.0 pipeline/params search for scDSC.

Parity: reference examples/tuning/cluster_scdsc/main.py (same step-2 pipeline
sweep + step-3 params protocol on the framework-native SweepRunner).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from _tuning_common import gen_kwargs, tuning_main

from _utils import clustering_data
from dance_tpu.modules.single_modality.clustering import ScDSC


def evaluate(planer, trial_cfg, seed, params_mode):
    data = clustering_data(n_cells=200, n_genes=100, n_types=3, seed=seed)
    planer.generate(**gen_kwargs(trial_cfg, params_mode)).functional(data)
    ScDSC.preprocessing_pipeline(n_top_genes=80, n_neighbors=15)(data)
    inputs, y = data.get_train_data()
    model = ScDSC(n_input=inputs[1].shape[1], n_clusters=3, sigma=0.5, n_enc_1=64, n_enc_2=32, n_enc_3=32, n_dec_1=32, n_dec_2=32, n_dec_3=64, n_z1=32, n_z2=16, n_z3=8, seed=seed)
    model.fit(inputs, y, epochs=40, pt_epochs=100)
    return {"ari": model.score(None, y)}


if __name__ == "__main__":
    tuning_main(evaluate, "ari", os.path.dirname(os.path.abspath(__file__)))

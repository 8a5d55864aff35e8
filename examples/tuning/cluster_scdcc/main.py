"""DANCE 2.0 pipeline/params search for scDCC.

Parity: reference examples/tuning/cluster_scdcc/main.py (same step-2 pipeline
sweep + step-3 params protocol on the framework-native SweepRunner).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from _tuning_common import gen_kwargs, tuning_main

from _utils import clustering_data
from dance_tpu.modules.single_modality.clustering import ScDCC


def evaluate(planer, trial_cfg, seed, params_mode):
    data = clustering_data(n_cells=200, n_genes=100, n_types=3, seed=seed)
    planer.generate(**gen_kwargs(trial_cfg, params_mode)).functional(data)
    ScDCC.preprocessing_pipeline(n_top_genes=80)(data)
    inputs, y = data.get_train_data()
    rng = np.random.default_rng(seed)
    from dance_tpu.transforms.preprocess import generate_random_pair
    idx = rng.choice(len(y), 60, replace=False)
    ml1, ml2, cl1, cl2, _ = generate_random_pair(y, idx, 200)
    model = ScDCC(input_dim=inputs[0].shape[1], z_dim=8, n_clusters=3,
                  encodeLayer=[64], decodeLayer=[64], sigma=1.5, seed=seed)
    model.fit(inputs, y, ml_ind1=ml1[:100], ml_ind2=ml2[:100], cl_ind1=cl1[:100],
              cl_ind2=cl2[:100], epochs=3, pt_epochs=30, batch_size=64,
              pt_batch_size=64)
    return {"ari": model.score(None, y)}


if __name__ == "__main__":
    tuning_main(evaluate, "ari", os.path.dirname(os.path.abspath(__file__)))

"""DANCE 2.0 pipeline/params search for SpaGCN spatial domain.

Parity: reference examples/tuning/domain_spagcn/main.py (same step-2 pipeline
sweep + step-3 params protocol on the framework-native SweepRunner).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from _tuning_common import gen_kwargs, tuning_main

from sklearn.metrics import adjusted_rand_score

from _utils import spatial_data
from dance_tpu.modules.spatial.spatial_domain import SpaGCN


def evaluate(planer, trial_cfg, seed, params_mode):
    data = spatial_data(n_spots=200, n_genes=100, n_domains=3, seed=seed)
    data.data.obs["label"] = data.data.obs["domain"]
    planer.generate(**gen_kwargs(trial_cfg, params_mode)).functional(data)
    SpaGCN.preprocessing_pipeline(alpha=1, beta=9, dim=20)(data)
    (embed, adj, adj_2d), y = data.get_train_data()
    model = SpaGCN(seed=seed)
    model.set_l(model.search_l(0.5, adj_2d))
    model.fit((embed, adj_2d), epochs=150, res=0.8)
    pred = model.predict((embed, adj_2d))
    ari = float(adjusted_rand_score(np.asarray(y).ravel(), np.asarray(pred).ravel()))
    return {"ari": ari}


if __name__ == "__main__":
    tuning_main(evaluate, "ari", os.path.dirname(os.path.abspath(__file__)))

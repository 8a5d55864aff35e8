"""DANCE 2.0 pipeline/params search for Stagate spatial domain.

Parity: reference examples/tuning/domain_stagate/main.py (same step-2 pipeline
sweep + step-3 params protocol on the framework-native SweepRunner).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from _tuning_common import gen_kwargs, tuning_main

from sklearn.metrics import adjusted_rand_score

from _utils import spatial_data
from dance_tpu.modules.spatial.spatial_domain import Stagate


def evaluate(planer, trial_cfg, seed, params_mode):
    data = spatial_data(n_spots=200, n_genes=100, n_domains=3, seed=seed)
    data.data.obs["label"] = data.data.obs["domain"]
    planer.generate(**gen_kwargs(trial_cfg, params_mode)).functional(data)
    Stagate.preprocessing_pipeline(n_top_genes=80, model_name="knn", n_neighbors=6)(data)
    (x, adj), y = data.get_train_data()
    model = Stagate(hidden_dims=(x.shape[1], 64, 16), seed=seed)
    model.fit((x, adj), epochs=100, n_clusters=3)
    pred = model.predict()
    ari = float(adjusted_rand_score(np.asarray(y).ravel(), np.asarray(pred).ravel()))
    return {"ari": ari}


if __name__ == "__main__":
    tuning_main(evaluate, "ari", os.path.dirname(os.path.abspath(__file__)))

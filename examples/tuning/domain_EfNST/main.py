"""DANCE 2.0 pipeline/params search for EfNsSTRunner spatial domain.

Parity: reference examples/tuning/domain_EfNST/main.py (same step-2 pipeline
sweep + step-3 params protocol on the framework-native SweepRunner).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from _tuning_common import gen_kwargs, tuning_main

from sklearn.metrics import adjusted_rand_score

from _utils import spatial_data
from dance_tpu.modules.spatial.spatial_domain import EfNsSTRunner


def evaluate(planer, trial_cfg, seed, params_mode):
    data = spatial_data(n_spots=200, n_genes=100, n_domains=3, seed=seed)
    data.data.obs["label"] = data.data.obs["domain"]
    planer.generate(**gen_kwargs(trial_cfg, params_mode)).functional(data)
    EfNsSTRunner.preprocessing_pipeline(pca_n_comps=20, k=6)(data)
    (pca_feat, img_feat, adj), y = data.get_train_data()
    concat = np.concatenate([pca_feat, img_feat], axis=1)
    model = EfNsSTRunner(n_clusters=3, z_dim=16, seed=seed)
    model.fit(concat_X=concat, graph_dict=adj, epochs=80, dec_epochs=30)
    pred = model.predict()
    ari = float(adjusted_rand_score(np.asarray(y).ravel(), np.asarray(pred).ravel()))
    return {"ari": ari}


if __name__ == "__main__":
    tuning_main(evaluate, "ari", os.path.dirname(os.path.abspath(__file__)))

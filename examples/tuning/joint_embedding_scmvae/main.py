"""DANCE 2.0 pipeline/params search for scMVAE (joint_embedding).

Parity: reference examples/tuning/joint_embedding_scmvae/main.py (same step-2 pipeline
sweep + step-3 params protocol on the framework-native SweepRunner).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from _tuning_common import gen_kwargs, tuning_main

from _utils import multimodal_data
from dance_tpu.modules.multi_modality.joint_embedding import scMVAE


def evaluate(planer, trial_cfg, seed, params_mode):
    data = multimodal_data(seed=seed)
    planer.generate(**gen_kwargs(trial_cfg, params_mode)).functional(data)
    x1_tr = np.log1p(data.get_feature(split_name="train", mod="mod1", channel_type="X"))
    x2_tr = np.log1p(data.get_feature(split_name="train", mod="mod2", channel_type="X"))
    x1_te = np.log1p(data.get_feature(split_name="test", mod="mod1", channel_type="X"))
    x2_te = np.log1p(data.get_feature(split_name="test", mod="mod2", channel_type="X"))
    ct = data.get_feature(split_name="train", mod="mod1", channel="cell_type",
                           channel_type="obs")
    model = scMVAE(z_dim=16, seed=seed,
                   n_centroids=2 * len(np.unique(np.asarray(ct))))
    model.fit(np.expm1(x1_tr), np.expm1(x2_tr), epochs=150)
    return {"nmi": model.score(None, ct)}


if __name__ == "__main__":
    tuning_main(evaluate, "nmi", os.path.dirname(os.path.abspath(__file__)),
                maximize=True)

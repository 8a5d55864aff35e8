"""DANCE 2.0 pipeline/params search for SpatialDecon deconvolution.

Parity: reference examples/tuning/deconv_spatialdecon/main.py (same step-2 pipeline
sweep + step-3 params protocol on the framework-native SweepRunner).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from _tuning_common import gen_kwargs, tuning_main

from dance_tpu.data import AnnData, Data
from dance_tpu.datasets.synthetic import synthetic_expression
from dance_tpu.modules.spatial.cell_type_deconvo import SpatialDecon


def _mixture(seed):
    rng = np.random.default_rng(seed)
    x_ref, labels = synthetic_expression(150, 80, 3, seed=seed + 1, effect=6.0)
    portions = rng.dirichlet(np.ones(3), 60)
    profiles = np.stack([x_ref[labels == c].mean(0) for c in range(3)])
    x_mix = rng.poisson(portions @ profiles * 3).astype(np.float32)
    return x_ref, labels, x_mix, portions, profiles


def evaluate(planer, trial_cfg, seed, params_mode):
    x_ref, labels, x_mix, portions, profiles = _mixture(seed)
    d = Data(AnnData(X=x_mix.copy()))
    planer.generate(**gen_kwargs(trial_cfg, params_mode)).functional(d)
    xp = np.asarray(d.data.X, dtype=np.float32)
    model = SpatialDecon(ct_profile=profiles.T, ct_select=[0, 1, 2])
    model.fit(xp, lr=1e-2, max_iter=400)
    pred = model.predict()
    mse = float(((pred - portions) ** 2).mean())
    return {"mse": mse}


if __name__ == "__main__":
    tuning_main(evaluate, "mse", os.path.dirname(os.path.abspath(__file__)),
                maximize=False)

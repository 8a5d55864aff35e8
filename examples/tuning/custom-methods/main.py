"""Registering a custom preprocessing function into the tuning search space.

Parity: reference examples/tuning/custom-methods — shows that any callable
registered under the ``preprocessor`` scope becomes a pipeline candidate.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from _tuning_common import gen_kwargs, tuning_main
from _utils import annotation_data
from dance_tpu.modules.single_modality.cell_type_annotation import ACTINN
from dance_tpu.registry import register
from dance_tpu.transforms.base import BaseTransform


@register("preprocessor.feature.cell.CustomUnitNorm")
class CustomUnitNorm(BaseTransform):
    """Toy custom feature op: L2-normalize each cell's expression vector."""

    def __init__(self, out: str = "feature.cell", **kwargs):
        super().__init__(out=out, **kwargs)

    def __call__(self, data):
        x = np.asarray(data.data.X, dtype=np.float32)
        norm = np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        data.data.obsm[self.out] = x / norm
        return data


def evaluate(planer, trial_cfg, seed, params_mode):
    data = annotation_data(n_cells=250, n_genes=80, n_types=3, seed=seed)
    planer.generate(**gen_kwargs(trial_cfg, params_mode)).functional(data)
    x_tr, y_tr = data.get_train_data(return_type="numpy")
    x_te, y_te = data.get_test_data(return_type="numpy")
    model = ACTINN(hidden_dims=(32, 16), random_seed=seed)
    model.fit(x_tr, y_tr, num_epochs=20, seed=seed)
    return {"acc": model.score(x_tr, y_tr), "test_acc": model.score(x_te, y_te)}


if __name__ == "__main__":
    tuning_main(evaluate, "test_acc", os.path.dirname(os.path.abspath(__file__)))

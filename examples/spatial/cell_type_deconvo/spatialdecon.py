"""SpatialDecon deconvolution benchmark script (parity: examples/spatial/cell_type_deconvo)."""
import sys

sys.path.insert(0, __file__.rsplit("/", 3)[0])
import numpy as np

from _utils import base_parser, set_seed
from dance_tpu.datasets.synthetic import synthetic_expression
from dance_tpu.modules.spatial.cell_type_deconvo import SpatialDecon

if __name__ == "__main__":
    args = base_parser("SpatialDecon").parse_args()
    set_seed(args.seed)
    rng = np.random.default_rng(args.seed)
    x_ref, labels = synthetic_expression(150, 80, 3, seed=1, effect=6.0)
    portions = rng.dirichlet(np.ones(3), 60)
    profiles = np.stack([x_ref[labels == c].mean(0) for c in range(3)])
    x_mix = rng.poisson(portions @ profiles * 3).astype(np.float32)
    model = SpatialDecon(ct_profile=profiles.T, ct_select=[0, 1, 2])
    model.fit(x_mix, lr=1e-2, max_iter=600)
    pred = model.predict()
    print(f"MSE: {((pred - portions) ** 2).mean():.5f}")

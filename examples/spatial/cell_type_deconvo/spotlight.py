"""SPOTlight deconvolution benchmark script (parity: examples/spatial/cell_type_deconvo)."""
import sys

sys.path.insert(0, __file__.rsplit("/", 3)[0])
import numpy as np

from _utils import base_parser, set_seed
from dance_tpu.datasets.synthetic import synthetic_expression
from dance_tpu.modules.spatial.cell_type_deconvo import SPOTlight

if __name__ == "__main__":
    args = base_parser("SPOTlight").parse_args()
    set_seed(args.seed)
    rng = np.random.default_rng(args.seed)
    x_ref, labels = synthetic_expression(150, 80, 3, seed=1, effect=6.0)
    portions = rng.dirichlet(np.ones(3), 60)
    profiles = np.stack([x_ref[labels == c].mean(0) for c in range(3)])
    x_mix = rng.poisson(portions @ profiles * 3).astype(np.float32)
    model = SPOTlight(ref_count=x_ref, ref_annot=labels.astype(str),
                      ct_select=["0", "1", "2"], rank=3)
    model.fit(x_mix, max_iter=400)
    pred = model.predict()
    print(f"MSE: {((pred - portions) ** 2).mean():.5f}")

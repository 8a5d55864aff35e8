"""MAGIC imputation benchmark script (parity: examples/.../magic.py)."""
import sys

sys.path.insert(0, __file__.rsplit("/", 3)[0])
import numpy as np

from _utils import load_synthetic, base_parser, imputation_data, set_seed
from dance_tpu.modules.single_modality.imputation import MAGIC

if __name__ == "__main__":
    p = base_parser("MAGIC imputation")
    p.add_argument("--mask_rate", type=float, default=0.1)
    args = p.parse_args()
    set_seed(args.seed)
    data = load_synthetic("imputation", args)
    MAGIC.preprocessing_pipeline(mask_rate=args.mask_rate, seed=args.seed)(data)
    (x, mask), (y, _) = data.get_x(), data.get_y()
    model = MAGIC()
    model.fit(x, mask=mask)
    imputed = model.predict()
    valid = data.data.layers["valid_mask"].astype(bool)
    rmse = float(np.sqrt(((np.asarray(y) - imputed)[valid] ** 2).mean()))
    print(f"RMSE: {rmse:.4f}")

"""Reference benchmark reproduction commands (upstream examples/single_modality/imputation/magic.py):

To reproduce deepimpute benchmarks, please refer to command lines belows:

Mouse Brain
$ python magic.py --dataset mouse_brain_data

Mouse Embryo
$ python magic.py --dataset mouse_embryo_data

PBMC
$ python magic.py --dataset pbmc_data

These CLIs apply once the raw benchmark data is staged under --data_dir; in
no-egress environments use the synthetic analogs instead, e.g.
``--dataset`` (see examples/_utils.py DATASET_ANALOGS).
"""

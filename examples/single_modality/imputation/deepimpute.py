"""DeepImpute imputation benchmark script (parity: examples/.../deepimpute.py)."""
import sys

sys.path.insert(0, __file__.rsplit("/", 3)[0])
import numpy as np

from _utils import load_synthetic, base_parser, imputation_data, set_seed
from dance_tpu.modules.single_modality.imputation import DeepImpute

if __name__ == "__main__":
    p = base_parser("DeepImpute imputation")
    p.add_argument("--mask_rate", type=float, default=0.1)
    args = p.parse_args()
    set_seed(args.seed)
    data = load_synthetic("imputation", args)
    DeepImpute.preprocessing_pipeline(mask_rate=args.mask_rate, seed=args.seed,
                                      sub_outputdim=60)(data)
    x, x_raw, targets, predictors, tm, vm, sm = data.get_x()
    y = data.get_y()[0]
    model = DeepImpute(predictors, targets, sub_outputdim=60,
                       seed=args.seed)
    model.fit(x, x, mask=tm, n_epochs=100)
    imputed = model.predict(x, mask=tm)
    valid = data.data.layers["valid_mask"].astype(bool)
    rmse = float(np.sqrt(((np.asarray(y) - imputed)[valid] ** 2).mean()))
    print(f"RMSE: {rmse:.4f}")

"""Reference benchmark reproduction commands (upstream examples/single_modality/imputation/deepimpute.py):

To reproduce deepimpute benchmarks, please refer to command lines belows:

Mouse Brain
$ python deepimpute.py --dataset mouse_brain_data

Mouse Embryo
$ python deepimpute.py --dataset mouse_embryo_data

PBMC
$ python deepimpute.py --dataset pbmc_data

These CLIs apply once the raw benchmark data is staged under --data_dir; in
no-egress environments use the synthetic analogs instead, e.g.
``--dataset`` (see examples/_utils.py DATASET_ANALOGS).
"""

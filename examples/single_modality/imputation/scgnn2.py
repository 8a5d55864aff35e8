"""ScGNN2 imputation benchmark script (parity: examples/.../scgnn2.py)."""
import sys

sys.path.insert(0, __file__.rsplit("/", 3)[0])
import numpy as np

from _utils import load_synthetic, base_parser, imputation_data, set_seed
from dance_tpu.modules.single_modality.imputation import ScGNN2

if __name__ == "__main__":
    p = base_parser("ScGNN2 imputation")
    p.add_argument("--mask_rate", type=float, default=0.1)
    args = p.parse_args()
    set_seed(args.seed)
    data = load_synthetic("imputation", args)
    ScGNN2.preprocessing_pipeline(mask_rate=args.mask_rate, seed=args.seed)(data)
    x, mask = data.get_x()
    y = data.get_y()[0]
    model = ScGNN2(seed=args.seed)
    model.fit(x, mask=mask)
    imputed = model.predict()
    valid = data.data.layers["valid_mask"].astype(bool)
    rmse = float(np.sqrt(((np.asarray(y) - imputed)[valid] ** 2).mean()))
    print(f"RMSE: {rmse:.4f}")

"""Reference benchmark reproduction commands (upstream examples/single_modality/imputation/scgnn2.py):

Mouse Brain
CUDA_VISIBLE_DEVICES=1 python scgnn2.py --dataset mouse_brain_data --feature_AE_epoch 20 10 --cluster_AE_epoch 20 --total_epoch 2

Mouse Embryo
CUDA_VISIBLE_DEVICES=1 python scgnn2.py --dataset mouse_embryo_data --feature_AE_epoch 20 10 --cluster_AE_epoch 20 --total_epoch 2

PBMC
CUDA_VISIBLE_DEVICES=6 python scgnn2.py --dataset pbmc_data --feature_AE_epoch 20 10 --cluster_AE_epoch 20 --total_epoch 2

These CLIs apply once the raw benchmark data is staged under --data_dir; in
no-egress environments use the synthetic analogs instead, e.g.
``--dataset`` (see examples/_utils.py DATASET_ANALOGS).
"""

"""GraphSCI imputation benchmark script (parity: examples/.../graphsci.py)."""
import sys

sys.path.insert(0, __file__.rsplit("/", 3)[0])
import numpy as np

from _utils import load_synthetic, base_parser, imputation_data, set_seed
from dance_tpu.modules.single_modality.imputation import GraphSCI

if __name__ == "__main__":
    p = base_parser("GraphSCI imputation")
    p.add_argument("--mask_rate", type=float, default=0.1)
    args = p.parse_args()
    set_seed(args.seed)
    data = load_synthetic("imputation", args)
    GraphSCI.preprocessing_pipeline(mask_rate=args.mask_rate, seed=args.seed)(data)
    g, x, mask = data.get_x()
    y = data.get_y()[0]
    model = GraphSCI(num_cells=x.shape[0], num_genes=x.shape[1], seed=args.seed)
    model.fit(g, x, np.expm1(x), mask=mask)
    imputed = model.predict(mask=mask)
    valid = data.data.layers["valid_mask"].astype(bool)
    rmse = float(np.sqrt(((np.asarray(y) - imputed)[valid] ** 2).mean()))
    print(f"RMSE: {rmse:.4f}")

"""Reference benchmark reproduction commands (upstream examples/single_modality/imputation/graphsci.py):

To reproduce GraphSCI benchmarks, please refer to command lines belows:

Mouse Brain:
CUDA_VISIBLE_DEVICES=2 python graphsci.py --dataset mouse_brain_data

Mouse Embryo:
CUDA_VISIBLE_DEVICES=2 python graphsci.py --dataset mouse_embryo_data

PBMC
CUDA_VISIBLE_DEVICES=2 python graphsci.py --dataset pbmc_data

These CLIs apply once the raw benchmark data is staged under --data_dir; in
no-egress environments use the synthetic analogs instead, e.g.
``--dataset`` (see examples/_utils.py DATASET_ANALOGS).
"""

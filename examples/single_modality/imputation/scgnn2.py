"""ScGNN2 imputation benchmark script (parity: examples/.../scgnn2.py)."""
import sys

sys.path.insert(0, __file__.rsplit("/", 3)[0])
import numpy as np

from _utils import base_parser, imputation_data, set_seed
from dance_tpu.modules.single_modality.imputation import ScGNN2

if __name__ == "__main__":
    p = base_parser("ScGNN2 imputation")
    p.add_argument("--mask_rate", type=float, default=0.1)
    args = p.parse_args()
    set_seed(args.seed)
    data = imputation_data(seed=args.seed)
    ScGNN2.preprocessing_pipeline(mask_rate=args.mask_rate, seed=args.seed)(data)
    x, mask = data.get_x()
    y = data.get_y()[0]
    model = ScGNN2(seed=args.seed)
    model.fit(x, mask=mask)
    imputed = model.predict()
    valid = data.data.layers["valid_mask"].astype(bool)
    rmse = float(np.sqrt(((np.asarray(y) - imputed)[valid] ** 2).mean()))
    print(f"RMSE: {rmse:.4f}")

"""ScMoGCNWrapper predict modality benchmark script (parity: examples/multi_modality/...)."""
import sys

sys.path.insert(0, __file__.rsplit("/", 3)[0])
import numpy as np

from _utils import base_parser, multimodal_data, set_seed
from dance_tpu.modules.multi_modality.predict_modality import ScMoGCNWrapper

if __name__ == "__main__":
    p = base_parser("ScMoGCNWrapper predict modality")
    p.add_argument("--use_bsr", action="store_true",
                   help="force the Pallas BSR path (default: auto-select on TPU)")
    args = p.parse_args()
    set_seed(args.seed)
    data = multimodal_data(seed=args.seed)
    x1_tr = np.log1p(data.get_feature(split_name="train", mod="mod1", channel_type="X"))
    x2_tr = np.log1p(data.get_feature(split_name="train", mod="mod2", channel_type="X"))
    x1_te = np.log1p(data.get_feature(split_name="test", mod="mod1", channel_type="X"))
    x2_te = np.log1p(data.get_feature(split_name="test", mod="mod2", channel_type="X"))
    model = ScMoGCNWrapper(seed=args.seed)
    model.fit(np.expm1(x1_tr), x2_tr, x_test=np.expm1(x1_te), epochs=150,
              use_bsr=args.use_bsr or "auto")
    print(f"RMSE: {model.score(np.expm1(x1_te), x2_te):.4f}")

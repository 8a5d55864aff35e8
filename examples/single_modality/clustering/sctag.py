"""ScTAG clustering benchmark script (parity: examples/.../sctag.py)."""
import sys

sys.path.insert(0, __file__.rsplit("/", 3)[0])
import numpy as np

from _utils import base_parser, clustering_data, set_seed
from dance_tpu.modules.single_modality.clustering import ScTAG

if __name__ == "__main__":
    p = base_parser("ScTAG clustering")
    p.add_argument("--use_bsr", action="store_true",
                   help="force the Pallas BSR path (default: auto-select on TPU)")
    p.add_argument("--n_clusters", type=int, default=3)
    p.add_argument("--epochs", type=int, default=100)
    args = p.parse_args()
    set_seed(args.seed)
    data = clustering_data(seed=args.seed)
    ScTAG.preprocessing_pipeline()(data)
    inputs, y = data.get_train_data()
    model = ScTAG(n_clusters=args.n_clusters, seed=args.seed)
    model.fit(inputs, y, epochs=args.epochs, pretrain_epochs=100,
              use_bsr=args.use_bsr or "auto")
    print(f"ARI: {model.score(None, y):.4f}")

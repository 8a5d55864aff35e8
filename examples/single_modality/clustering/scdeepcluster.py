"""ScDeepCluster clustering benchmark script (parity: examples/.../scdeepcluster.py)."""
import sys

sys.path.insert(0, __file__.rsplit("/", 3)[0])
import numpy as np

from _utils import base_parser, clustering_data, set_seed
from dance_tpu.modules.single_modality.clustering import ScDeepCluster

if __name__ == "__main__":
    p = base_parser("ScDeepCluster clustering")
    p.add_argument("--n_clusters", type=int, default=3)
    p.add_argument("--epochs", type=int, default=10)
    args = p.parse_args()
    set_seed(args.seed)
    data = clustering_data(seed=args.seed)
    ScDeepCluster.preprocessing_pipeline()(data)
    inputs, y = data.get_train_data()
    model = ScDeepCluster(input_dim=inputs[0].shape[1], z_dim=32, seed=args.seed)
    model.fit(inputs, y, n_clusters=args.n_clusters, epochs=args.epochs, pt_epochs=100)
    print(f"ARI: {model.score(None, y):.4f}")

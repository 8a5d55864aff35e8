"""StKmeans spatial benchmark script (parity: examples/spatial/...)."""
import sys

sys.path.insert(0, __file__.rsplit("/", 3)[0])
import numpy as np

from _utils import base_parser, set_seed, spatial_data
from dance_tpu.modules.spatial.spatial_domain import StKmeans

if __name__ == "__main__":
    p = base_parser("StKmeans")
    p.add_argument("--n_clusters", type=int, default=3)
    args = p.parse_args()
    set_seed(args.seed)
    data = spatial_data(seed=args.seed)
    data.data.obs["label"] = data.data.obs["domain"]
    StKmeans.preprocessing_pipeline(n_components=20)(data)
    x, y = data.get_train_data()
    model = StKmeans(n_clusters=args.n_clusters)
    model.fit(x)
    from sklearn.metrics import adjusted_rand_score
    print(f"ARI: {adjusted_rand_score(np.asarray(y).ravel(), model.predict()):.4f}")

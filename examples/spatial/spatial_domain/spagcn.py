"""SpaGCN spatial benchmark script (parity: examples/spatial/...)."""
import sys

sys.path.insert(0, __file__.rsplit("/", 3)[0])
import numpy as np

from _utils import base_parser, set_seed, spatial_data
from dance_tpu.modules.spatial.spatial_domain import SpaGCN

if __name__ == "__main__":
    p = base_parser("SpaGCN")
    p.add_argument("--n_clusters", type=int, default=3)
    args = p.parse_args()
    set_seed(args.seed)
    data = spatial_data(seed=args.seed)
    data.data.obs["label"] = data.data.obs["domain"]
    SpaGCN.preprocessing_pipeline(alpha=1, beta=9, dim=20)(data)
    (embed, adj, adj_2d), y = data.get_train_data()
    model = SpaGCN(seed=args.seed)
    model.set_l(model.search_l(0.5, adj_2d))
    model.fit((embed, adj_2d), epochs=500)
    from sklearn.metrics import adjusted_rand_score
    print(f"ARI: {adjusted_rand_score(np.asarray(y).ravel(), model.predict((embed, adj_2d))):.4f}")

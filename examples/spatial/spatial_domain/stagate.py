"""Stagate spatial benchmark script (parity: examples/spatial/...)."""
import sys

sys.path.insert(0, __file__.rsplit("/", 3)[0])
import numpy as np

from _utils import load_synthetic, base_parser, set_seed, spatial_data
from dance_tpu.modules.spatial.spatial_domain import Stagate

if __name__ == "__main__":
    p = base_parser("Stagate")
    p.add_argument("--n_clusters", type=int, default=3)
    args = p.parse_args()
    set_seed(args.seed)
    data = load_synthetic("spatial", args)
    data.data.obs["label"] = data.data.obs["domain"]
    Stagate.preprocessing_pipeline(n_top_genes=80, model_name="knn", n_neighbors=6)(data)
    (x, adj), y = data.get_train_data()
    model = Stagate(hidden_dims=(x.shape[1], 64, 16), seed=args.seed)
    model.fit((x, adj), epochs=300, n_clusters=args.n_clusters)
    from sklearn.metrics import adjusted_rand_score
    print(f"ARI: {adjusted_rand_score(np.asarray(y).ravel(), model.predict()):.4f}")

"""Reference benchmark reproduction commands (upstream examples/spatial/spatial_domain/stagate.py):

To reproduce Stagate on other samples, please refer to command lines belows:
NOTE: since the stagate method is unstable, you have to run at least 5 times to get
      best performance. (same with original Stagate paper)

human dorsolateral prefrontal cortex sample 151673:
$ python stagate.py --sample_number 151673

human dorsolateral prefrontal cortex sample 151676:
$ python stagate.py --sample_number 151676

human dorsolateral prefrontal cortex sample 151507:
$ python stagate.py --sample_number 151507

These CLIs apply once the raw benchmark data is staged under --data_dir; in
no-egress environments use the synthetic analogs instead, e.g.
``--dataset`` (see examples/_utils.py DATASET_ANALOGS).
"""

"""StKmeans spatial benchmark script (parity: examples/spatial/...)."""
import sys

sys.path.insert(0, __file__.rsplit("/", 3)[0])
import numpy as np

from _utils import load_synthetic, base_parser, set_seed, spatial_data
from dance_tpu.modules.spatial.spatial_domain import StKmeans

if __name__ == "__main__":
    p = base_parser("StKmeans")
    p.add_argument("--n_clusters", type=int, default=3)
    args = p.parse_args()
    set_seed(args.seed)
    data = load_synthetic("spatial", args)
    data.data.obs["label"] = data.data.obs["domain"]
    StKmeans.preprocessing_pipeline(n_components=20)(data)
    x, y = data.get_train_data()
    model = StKmeans(n_clusters=args.n_clusters)
    model.fit(x)
    from sklearn.metrics import adjusted_rand_score
    print(f"ARI: {adjusted_rand_score(np.asarray(y).ravel(), model.predict()):.4f}")

"""Reference benchmark reproduction commands (upstream examples/spatial/spatial_domain/stlearn.py):

To reproduce stlearn on other samples, please refer to command lines belows:
NOTE: since the stlearn method is unstable, you have to run multiple times to get
      best performance.

human dorsolateral prefrontal cortex sample 151673:
$ python stlearn.py --n_clusters 20 --sample_number 151673

human dorsolateral prefrontal cortex sample 151676:
$ python stlearn.py --n_clusters 20 --sample_number 151676

human dorsolateral prefrontal cortex sample 151507:
$ python stlearn.py --n_clusters 20 --sample_number 151507

These CLIs apply once the raw benchmark data is staged under --data_dir; in
no-egress environments use the synthetic analogs instead, e.g.
``--dataset`` (see examples/_utils.py DATASET_ANALOGS).
"""

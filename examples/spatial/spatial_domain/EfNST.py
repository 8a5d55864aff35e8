"""EfNST spatial-domain benchmark script (parity: examples/spatial/
spatial_domain/EfNST.py): CNN image features + expression PCA fused over the
spot graph, DEC-refined clustering."""
import sys

sys.path.insert(0, __file__.rsplit("/", 3)[0])
import numpy as np

from _utils import load_synthetic, base_parser, set_seed, spatial_data
from dance_tpu.modules.spatial.spatial_domain import EfNsSTRunner

if __name__ == "__main__":
    p = base_parser("EfNST spatial domain")
    p.add_argument("--n_clusters", type=int, default=3)
    p.add_argument("--epochs", type=int, default=100)
    args = p.parse_args()
    set_seed(args.seed)
    data = load_synthetic("spatial", args)
    data.data.obs["label"] = data.data.obs["domain"]
    EfNsSTRunner.preprocessing_pipeline(pca_n_comps=20, k=6)(data)
    (pca_feat, img_feat, adj), y = data.get_train_data()
    concat = np.concatenate([pca_feat, img_feat], axis=1)
    model = EfNsSTRunner(n_clusters=args.n_clusters, z_dim=16, seed=args.seed)
    model.fit(concat_X=concat, graph_dict=adj, epochs=args.epochs, dec_epochs=40)
    from sklearn.metrics import adjusted_rand_score
    print(f"ARI: {adjusted_rand_score(np.asarray(y).ravel(), model.predict()):.4f}")

"""Reference benchmark reproduction commands (upstream examples/spatial/spatial_domain/EfNST.py):

python EfNST.py --sample_number 151507
python EfNST.py --sample_number 151673
python EfNST.py --sample_number 151676

These CLIs apply once the raw benchmark data is staged under --data_dir; in
no-egress environments use the synthetic analogs instead, e.g.
``--dataset`` (see examples/_utils.py DATASET_ANALOGS).
"""

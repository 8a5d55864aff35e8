"""SpaGCN spatial benchmark script (parity: examples/spatial/spatial_domain/
spagcn.py — l search, resolution search, fit, and hexagon refinement)."""
import sys

sys.path.insert(0, __file__.rsplit("/", 3)[0])
import numpy as np

from _utils import load_synthetic, base_parser, set_seed, spatial_data
from dance_tpu.modules.spatial.spatial_domain import SpaGCN
from dance_tpu.modules.spatial.spatial_domain.spagcn import refine

if __name__ == "__main__":
    p = base_parser("SpaGCN")
    p.add_argument("--n_clusters", type=int, default=3)
    p.add_argument("--search_res", action="store_true",
                   help="run the reference's resolution search (slower)")
    args = p.parse_args()
    set_seed(args.seed)
    data = load_synthetic("spatial", args)
    data.data.obs["label"] = data.data.obs["domain"]
    SpaGCN.preprocessing_pipeline(alpha=1, beta=9, dim=20)(data)
    (embed, adj, adj_2d), y = data.get_train_data()
    model = SpaGCN(seed=args.seed)
    l = model.search_l(0.5, adj_2d)
    model.set_l(l)
    if args.search_res:
        res = model.search_set_res((embed, adj_2d), l=l,
                                   target_num=args.n_clusters, epochs=100)
    else:
        res = 0.4
    pred = model.fit_predict((embed, adj_2d), epochs=500, res=res)
    from sklearn.metrics import adjusted_rand_score
    y = np.asarray(y).ravel()
    print(f"ARI: {adjusted_rand_score(y, pred):.4f}")
    refined = refine(sample_id=list(range(len(pred))), pred=list(pred),
                     dis=adj_2d, shape="hexagon")
    print(f"ARI (refined): {adjusted_rand_score(y, refined):.4f}")

"""Reference benchmark reproduction commands (upstream examples/spatial/spatial_domain/spagcn.py):

To reproduce SpaGCN on other samples, please refer to command lines belows:

human dorsolateral prefrontal cortex sample 151673:
$ python spagcn.py --sample_number 151673 --lr 0.1

human dorsolateral prefrontal cortex sample 151676:
$ python spagcn.py --sample_number 151676 --lr 0.02

human dorsolateral prefrontal cortex sample 151507:
$ python spagcn.py --sample_number 151507 --lr 0.009

These CLIs apply once the raw benchmark data is staged under --data_dir; in
no-egress environments use the synthetic analogs instead, e.g.
``--dataset`` (see examples/_utils.py DATASET_ANALOGS).
"""

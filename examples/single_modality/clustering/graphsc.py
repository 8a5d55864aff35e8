"""GraphSC clustering benchmark script (parity: examples/.../graphsc.py)."""
import sys

sys.path.insert(0, __file__.rsplit("/", 3)[0])
import numpy as np

from _utils import load_synthetic, base_parser, clustering_data, set_seed
from dance_tpu.modules.single_modality.clustering import GraphSC

if __name__ == "__main__":
    p = base_parser("GraphSC clustering")
    p.add_argument("--n_clusters", type=int, default=3)
    p.add_argument("--epochs", type=int, default=50)
    args = p.parse_args()
    set_seed(args.seed)
    data = load_synthetic("clustering", args)
    GraphSC.preprocessing_pipeline()(data)
    g, y = data.get_train_data()
    model = GraphSC(n_clusters=args.n_clusters, seed=args.seed)
    model.fit(g, y, epochs=args.epochs)
    print(f"ARI: {model.score(None, y):.4f}")

"""Reference benchmark reproduction commands (upstream examples/single_modality/clustering/graphsc.py):

Reproduction information
10X PBMC:
python graphsc.py --dataset 10X_PBMC --dropout 0.5

Mouse ES:
python graphsc.py --dataset mouse_ES_cell

Worm Neuron:
python graphsc.py --dataset worm_neuron_cell

Mouse Bladder:
python graphsc.py --dataset mouse_bladder_cell

These CLIs apply once the raw benchmark data is staged under --data_dir; in
no-egress environments use the synthetic analogs instead, e.g.
``--dataset`` (see examples/_utils.py DATASET_ANALOGS).
"""

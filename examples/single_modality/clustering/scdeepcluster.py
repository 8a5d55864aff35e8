"""ScDeepCluster clustering benchmark script (parity: examples/.../scdeepcluster.py)."""
import sys

sys.path.insert(0, __file__.rsplit("/", 3)[0])
import numpy as np

from _utils import load_synthetic, base_parser, clustering_data, set_seed
from dance_tpu.modules.single_modality.clustering import ScDeepCluster

if __name__ == "__main__":
    p = base_parser("ScDeepCluster clustering")
    p.add_argument("--n_clusters", type=int, default=3)
    p.add_argument("--epochs", type=int, default=10)
    args = p.parse_args()
    set_seed(args.seed)
    data = load_synthetic("clustering", args)
    ScDeepCluster.preprocessing_pipeline()(data)
    inputs, y = data.get_train_data()
    model = ScDeepCluster(input_dim=inputs[0].shape[1], z_dim=32, seed=args.seed)
    model.fit(inputs, y, n_clusters=args.n_clusters, epochs=args.epochs, pt_epochs=100)
    print(f"ARI: {model.score(None, y):.4f}")

"""Reference benchmark reproduction commands (upstream examples/single_modality/clustering/scdeepcluster.py):

Reproduction information
10X PBMC:
python scdeepcluster.py --dataset 10X_PBMC --pretrain_epochs 300 --epochs 100 --sigma 2

Mouse ES:
python scdeepcluster.py --dataset mouse_ES_cell --pretrain_epochs 300 --epochs 100 --sigma 1.75 --encodeLayer 512 256

Worm Neuron:
python scdeepcluster.py --dataset worm_neuron_cell --pretrain_epochs 300 --epochs 100 --sigma 1.5

Mouse Bladder:
python scdeepcluster.py --dataset mouse_bladder_cell --pretrain_epochs 300 --sigma 2 --epochs 100

These CLIs apply once the raw benchmark data is staged under --data_dir; in
no-egress environments use the synthetic analogs instead, e.g.
``--dataset`` (see examples/_utils.py DATASET_ANALOGS).
"""

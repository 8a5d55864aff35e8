"""ScDCC clustering benchmark script (parity: examples/.../scdcc.py)."""
import sys

sys.path.insert(0, __file__.rsplit("/", 3)[0])
import numpy as np

from _utils import load_synthetic, base_parser, clustering_data, set_seed
from dance_tpu.modules.single_modality.clustering import ScDCC

if __name__ == "__main__":
    p = base_parser("ScDCC clustering")
    p.add_argument("--n_clusters", type=int, default=3)
    p.add_argument("--epochs", type=int, default=10)
    args = p.parse_args()
    set_seed(args.seed)
    data = load_synthetic("clustering", args)
    ScDCC.preprocessing_pipeline()(data)
    inputs, y = data.get_train_data()
    model = ScDCC(input_dim=inputs[0].shape[1], z_dim=32, n_clusters=args.n_clusters,
                  seed=args.seed)
    model.fit(inputs, y, epochs=args.epochs, pt_epochs=100)
    print(f"ARI: {model.score(None, y):.4f}")

"""Reference benchmark reproduction commands (upstream examples/single_modality/clustering/scdcc.py):

Reproduction information
10X PBMC:
python scdcc.py --dataset 10X_PBMC --label_cells_files label_10X_PBMC.txt --pretrain_epochs 300 --epochs 100 --sigma 2 --n_pairwise 10000 --cache

Mouse ES:
python scdcc.py --dataset mouse_ES_cell --label_cells_files label_mouse_ES_cell.txt --pretrain_epochs 300 --epochs 100 --sigma 1.75 --encodeLayer 512 256  --n_pairwise 10000 --cache

Worm Neuron:
python scdcc.py --dataset worm_neuron_cell --label_cells_files label_worm_neuron_cell.txt --pretrain_epochs 300 --epochs 100 --n_pairwise 20000 --cache

Mouse Bladder:
python scdcc.py --dataset mouse_bladder_cell --label_cells_files label_mouse_bladder_cell.txt --pretrain_epochs 300 --epochs 100 --sigma 3.25 --n_pairwise 10000 --cache

These CLIs apply once the raw benchmark data is staged under --data_dir; in
no-egress environments use the synthetic analogs instead, e.g.
``--dataset`` (see examples/_utils.py DATASET_ANALOGS).
"""

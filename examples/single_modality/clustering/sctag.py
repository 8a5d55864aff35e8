"""ScTAG clustering benchmark script (parity: examples/.../sctag.py)."""
import sys

sys.path.insert(0, __file__.rsplit("/", 3)[0])
import numpy as np

from _utils import load_synthetic, base_parser, clustering_data, set_seed
from dance_tpu.modules.single_modality.clustering import ScTAG

if __name__ == "__main__":
    p = base_parser("ScTAG clustering")
    p.add_argument("--use_bsr", action="store_true",
                   help="force the Pallas BSR path (default: auto-select on TPU)")
    p.add_argument("--n_clusters", type=int, default=3)
    p.add_argument("--epochs", type=int, default=100)
    args = p.parse_args()
    set_seed(args.seed)
    data = load_synthetic("clustering", args)
    ScTAG.preprocessing_pipeline()(data)
    inputs, y = data.get_train_data()
    model = ScTAG(n_clusters=args.n_clusters, seed=args.seed)
    model.fit(inputs, y, epochs=args.epochs, pretrain_epochs=100,
              use_bsr=args.use_bsr or "auto")
    print(f"ARI: {model.score(None, y):.4f}")

"""Reference benchmark reproduction commands (upstream examples/single_modality/clustering/sctag.py):

Reproduction information
10X PBMC:
python sctag.py --dataset 10X_PBMC --pretrain_epochs 100 --w_a 0.01 --w_x 3 --w_c 0.1 --dropout 0.5

Mouse ES:
python sctag.py --dataset mouse_ES_cell --pretrain_epochs 100 --w_a 0.01 --w_x 0.75 --w_c 1

Worm Neuron:
python sctag.py --dataset worm_neuron_cell --w_a 0.01 --w_x 2 --w_c 0.25 --k 1

Mouse Bladder:
python sctag.py --dataset mouse_bladder_cell --pretrain_epochs 100 --w_a 0.1 --w_x 2.5 --w_c 3

These CLIs apply once the raw benchmark data is staged under --data_dir; in
no-egress environments use the synthetic analogs instead, e.g.
``--dataset`` (see examples/_utils.py DATASET_ANALOGS).
"""

"""ScDSC clustering benchmark script (parity: examples/.../scdsc.py)."""
import sys

sys.path.insert(0, __file__.rsplit("/", 3)[0])
import numpy as np

from _utils import load_synthetic, base_parser, clustering_data, set_seed
from dance_tpu.modules.single_modality.clustering import ScDSC

if __name__ == "__main__":
    p = base_parser("ScDSC clustering")
    p.add_argument("--use_bsr", action="store_true",
                   help="force the Pallas BSR path (default: auto-select on TPU)")
    p.add_argument("--n_clusters", type=int, default=3)
    p.add_argument("--epochs", type=int, default=100)
    args = p.parse_args()
    set_seed(args.seed)
    data = load_synthetic("clustering", args)
    ScDSC.preprocessing_pipeline()(data)
    inputs, y = data.get_train_data()
    model = ScDSC(n_input=inputs[1].shape[1], n_clusters=args.n_clusters, seed=args.seed)
    model.fit(inputs, y, epochs=args.epochs, pt_epochs=150, use_bsr=args.use_bsr or "auto")
    print(f"ARI: {model.score(None, y):.4f}")

"""Reference benchmark reproduction commands (upstream examples/single_modality/clustering/scdsc.py):

Reproduction information
10X PBMC:
python scdsc.py --dataset 10X_PBMC --sigma 0.5 --topk 10 --pretrain_epochs 100 --v 3 --n_enc_1 1024 --n_enc_3 64 --n_dec_1 64 --n_z1 64

Mouse Bladder:
python scdsc.py --dataset mouse_bladder_cell --sigma 0.5 --topk 50 --pretrain_epochs 100 --v 7

Mouse ES:
python scdsc.py --dataset mouse_ES_cell --sigma 0.1 --topk 10 --pretrain_epochs 50 --v 2

Worm Neuron:
python scdsc.py --dataset worm_neuron_cell --sigma 0.5 --topk 10 --pretrain_epochs 100 --v 3 --n_enc_3 64 --n_dec_1 64 --n_z1 64 --n_z2 64

These CLIs apply once the raw benchmark data is staged under --data_dir; in
no-egress environments use the synthetic analogs instead, e.g.
``--dataset`` (see examples/_utils.py DATASET_ANALOGS).
"""

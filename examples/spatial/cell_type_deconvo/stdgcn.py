"""StdGCN deconvolution benchmark script (parity: examples/spatial/cell_type_deconvo)."""
import sys

sys.path.insert(0, __file__.rsplit("/", 3)[0])
import numpy as np

from _utils import base_parser, load_synthetic, set_seed
from dance_tpu.modules.spatial.cell_type_deconvo import StdGCN

if __name__ == "__main__":
    p = base_parser("StdGCN")
    p.add_argument("--use_bsr", action="store_true",
                   help="force the Pallas BSR path (default: auto-select on TPU)")
    p.add_argument("--max_epochs", type=int, default=200)
    args = p.parse_args()
    set_seed(args.seed)
    d = load_synthetic("deconvo", args, n_spots=60, n_genes=80, n_types=3)
    rng = np.random.default_rng(args.seed)
    n_pseudo = max(100, 2 * len(d.x_mix))
    ps_port = rng.dirichlet(np.ones(d.n_types), n_pseudo)
    ps_x = rng.poisson(ps_port @ d.profiles * 3).astype(np.float32)
    feats = np.log1p(np.concatenate([ps_x, d.x_mix], axis=0))
    coords = np.concatenate([np.zeros((n_pseudo, 2)), d.spatial * 10], axis=0)
    y = np.concatenate([ps_port, np.zeros_like(d.portions)], axis=0)
    model = StdGCN(seed=args.seed)
    model.fit((feats, coords), y, max_epochs=args.max_epochs,
              use_bsr=args.use_bsr or "auto")
    pred = model.predict()[n_pseudo:]
    print(f"MSE: {((pred - d.portions) ** 2).mean():.5f}")

"""Reference benchmark reproduction commands (upstream examples/spatial/cell_type_deconvo/stdgcn.py:20 (argparse default; upstream carries no reproduce block)):

Default benchmark:
$ python stdgcn.py --dataset CARD_synthetic

These CLIs apply once the raw benchmark data is staged; in no-egress
environments use the synthetic analogs instead (examples/_utils.py
DATASET_ANALOGS).
"""

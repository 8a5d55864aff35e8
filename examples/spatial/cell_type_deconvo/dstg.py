"""DSTG deconvolution benchmark script (parity: examples/spatial/cell_type_deconvo)."""
import sys

sys.path.insert(0, __file__.rsplit("/", 3)[0])
import numpy as np

from _utils import base_parser, load_synthetic, set_seed
from dance_tpu.modules.spatial.cell_type_deconvo import DSTG

if __name__ == "__main__":
    p = base_parser("DSTG")
    p.add_argument("--use_bsr", action="store_true",
                   help="force the Pallas BSR path (default: auto-select on TPU)")
    p.add_argument("--max_epochs", type=int, default=200)
    # per-dataset tuned knobs, mirroring the upstream reproduce commands'
    # per-dataset flags (--nhid/--lr/--k_filter below)
    p.add_argument("--lr", type=float, default=0.005)
    p.add_argument("--k_filter", type=int, default=30)
    p.add_argument("--num_cc", type=int, default=10)
    p.add_argument("--n_pseudo_mult", type=int, default=2,
                   help="pseudo-spot count as a multiple of real spots")
    p.add_argument("--ps_scale", type=float, default=3.0,
                   help="Poisson rate scale for pseudo-spot counts")
    args = p.parse_args()
    set_seed(args.seed)
    d = load_synthetic("deconvo", args, n_spots=60, n_genes=80, n_types=3)
    rng = np.random.default_rng(args.seed)
    from dance_tpu.transforms.graph.dstg_graph import compute_dstg_adj
    n_pseudo = max(100, args.n_pseudo_mult * len(d.x_mix))
    ps_port = rng.dirichlet(np.ones(d.n_types), n_pseudo)
    ps_x = rng.poisson(ps_port @ d.profiles * args.ps_scale).astype(np.float32)
    feats = np.log1p(np.concatenate([ps_x, d.x_mix], axis=0))
    adj = compute_dstg_adj(ps_x, d.x_mix, k_filter=args.k_filter,
                           num_cc=args.num_cc)
    y = np.concatenate([ps_port, np.zeros_like(d.portions)], axis=0)
    model = DSTG(seed=args.seed)
    model.fit((feats, adj), y, max_epochs=args.max_epochs, lr=args.lr,
              use_bsr=args.use_bsr or "auto")
    pred = model.predict()[n_pseudo:]
    print(f"MSE: {((pred - d.portions) ** 2).mean():.5f}")

"""Reference benchmark reproduction commands (upstream examples/spatial/cell_type_deconvo/dstg.py):

To reproduce DSTG benchmarks, please refer to command lines belows:

GSE174746:
$ python dstg.py --dataset GSE174746 --nhid 16 --lr .0001 --k_filter 50

CARD synthetic:
$ python dstg.py --dataset CARD_synthetic --nhid 16 --lr .001 --k_filter 50

SPOTLight synthetic:
$ python dstg.py --dataset SPOTLight_synthetic --nhid 32 --lr .1 --epochs 25

These CLIs apply once the raw benchmark data is staged under --data_dir; in
no-egress environments use the synthetic analogs instead, e.g.
``--dataset`` (see examples/_utils.py DATASET_ANALOGS).
"""

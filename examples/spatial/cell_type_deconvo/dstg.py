"""DSTG deconvolution benchmark script (parity: examples/spatial/cell_type_deconvo)."""
import sys

sys.path.insert(0, __file__.rsplit("/", 3)[0])
import numpy as np

from _utils import base_parser, set_seed
from dance_tpu.datasets.synthetic import synthetic_expression
from dance_tpu.modules.spatial.cell_type_deconvo import DSTG

if __name__ == "__main__":
    p = base_parser("DSTG")
    p.add_argument("--use_bsr", action="store_true",
                   help="force the Pallas BSR path (default: auto-select on TPU)")
    args = p.parse_args()
    set_seed(args.seed)
    rng = np.random.default_rng(args.seed)
    x_ref, labels = synthetic_expression(150, 80, 3, seed=1, effect=6.0)
    portions = rng.dirichlet(np.ones(3), 60)
    profiles = np.stack([x_ref[labels == c].mean(0) for c in range(3)])
    x_mix = rng.poisson(portions @ profiles * 3).astype(np.float32)
    from dance_tpu.transforms.graph.dstg_graph import compute_dstg_adj
    ps_port = rng.dirichlet(np.ones(3), 100)
    ps_x = rng.poisson(ps_port @ profiles * 3).astype(np.float32)
    feats = np.log1p(np.concatenate([ps_x, x_mix], axis=0))
    adj = compute_dstg_adj(ps_x, x_mix, k_filter=30, num_cc=10)
    y = np.concatenate([ps_port, np.zeros_like(portions)], axis=0)
    model = DSTG(seed=args.seed)
    model.fit((feats, adj), y, max_epochs=200, use_bsr=args.use_bsr or "auto")
    pred = model.predict()[100:]
    print(f"MSE: {((pred - portions) ** 2).mean():.5f}")

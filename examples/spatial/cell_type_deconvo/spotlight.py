"""SPOTlight deconvolution benchmark script (parity: examples/spatial/cell_type_deconvo)."""
import sys

sys.path.insert(0, __file__.rsplit("/", 3)[0])

from _utils import base_parser, load_synthetic, set_seed
from dance_tpu.modules.spatial.cell_type_deconvo import SPOTlight

if __name__ == "__main__":
    p = base_parser("SPOTlight")
    p.add_argument("--max_iter", type=int, default=400)
    args = p.parse_args()
    set_seed(args.seed)
    d = load_synthetic("deconvo", args, n_spots=60, n_genes=80, n_types=3)
    model = SPOTlight(ref_count=d.x_ref, ref_annot=d.labels.astype(str),
                      ct_select=[str(i) for i in range(d.n_types)],
                      rank=d.n_types)
    model.fit(d.x_mix, max_iter=args.max_iter)
    pred = model.predict()
    print(f"MSE: {((pred - d.portions) ** 2).mean():.5f}")

"""Reference benchmark reproduction commands (upstream examples/spatial/cell_type_deconvo/spotlight.py):

To reproduce SpatialDecon benchmarks, please refer to command lines belows:

GSE174746:
$ python spotlight.py --dataset GSE174746 --lr .1 --max_iter 15000 --rank 4 --bias 0

CARD synthetic:
$ python spotlight.py --dataset CARD_synthetic --lr .1 --max_iter 100 --rank 8 --bias 0

SPOTLight synthetic:
$ python spotlight.py --dataset SPOTLight_synthetic --lr .1 --max_iter 150 --rank 10 --bias 0

These CLIs apply once the raw benchmark data is staged under --data_dir; in
no-egress environments use the synthetic analogs instead, e.g.
``--dataset`` (see examples/_utils.py DATASET_ANALOGS).
"""

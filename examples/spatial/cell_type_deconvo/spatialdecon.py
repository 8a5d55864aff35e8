"""SpatialDecon deconvolution benchmark script (parity: examples/spatial/cell_type_deconvo)."""
import sys

sys.path.insert(0, __file__.rsplit("/", 3)[0])

from _utils import base_parser, load_synthetic, set_seed
from dance_tpu.modules.spatial.cell_type_deconvo import SpatialDecon

if __name__ == "__main__":
    p = base_parser("SpatialDecon")
    p.add_argument("--max_iter", type=int, default=600)
    args = p.parse_args()
    set_seed(args.seed)
    d = load_synthetic("deconvo", args, n_spots=60, n_genes=80, n_types=3)
    model = SpatialDecon(ct_profile=d.profiles.T, ct_select=list(range(d.n_types)))
    model.fit(d.x_mix, lr=1e-2, max_iter=args.max_iter)
    pred = model.predict()
    print(f"MSE: {((pred - d.portions) ** 2).mean():.5f}")

"""Reference benchmark reproduction commands (upstream examples/spatial/cell_type_deconvo/spatialdecon.py):

To reproduce SpatialDecon benchmarks, please refer to command lines belows:

GSE174746:
$ python spatialdecon.py --dataset GSE174746 --lr .0001 --max_iter 20000 --bias 1

CARD synthetic:
$ python spatialdecon.py --dataset CARD_synthetic --lr .01 --max_iter 2250 --bias 1

SPOTLight synthetic:
$ python spatialdecon.py --dataset SPOTLight_synthetic --lr .01 --max_iter 500 --bias 1

These CLIs apply once the raw benchmark data is staged under --data_dir; in
no-egress environments use the synthetic analogs instead, e.g.
``--dataset`` (see examples/_utils.py DATASET_ANALOGS).
"""

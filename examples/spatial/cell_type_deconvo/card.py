"""Card deconvolution benchmark script (parity: examples/spatial/cell_type_deconvo)."""
import sys

sys.path.insert(0, __file__.rsplit("/", 3)[0])

from _utils import base_parser, load_synthetic, set_seed
from dance_tpu.modules.spatial.cell_type_deconvo import Card

if __name__ == "__main__":
    p = base_parser("Card")
    p.add_argument("--max_iter", type=int, default=50)
    args = p.parse_args()
    set_seed(args.seed)
    d = load_synthetic("deconvo", args, n_spots=60, n_genes=80, n_types=3)
    model = Card(d.profiles_df)
    model.fit((d.x_mix, d.spatial), max_iter=args.max_iter)
    pred = model.predict()
    print(f"MSE: {((pred - d.portions) ** 2).mean():.5f}")

"""Reference benchmark reproduction commands (upstream examples/spatial/cell_type_deconvo/card.py):

To reproduce CARD benchmarks, please refer to command lines belows:

GSE174746:
$ python card.py --dataset GSE174746 --location_free

CARD synthetic:
$ python card.py --dataset CARD_synthetic

SPOTLight synthetic:
$ python card.py --dataset SPOTLight_synthetic --location_free

These CLIs apply once the raw benchmark data is staged under --data_dir; in
no-egress environments use the synthetic analogs instead, e.g.
``--dataset`` (see examples/_utils.py DATASET_ANALOGS).
"""

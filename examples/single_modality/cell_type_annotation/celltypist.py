"""Celltypist benchmark script (parity: examples/.../celltypist.py)."""
import sys

sys.path.insert(0, __file__.rsplit("/", 3)[0])
import numpy as np

from _utils import load_synthetic, annotation_data, base_parser, set_seed
from dance_tpu.modules.single_modality.cell_type_annotation import Celltypist

if __name__ == "__main__":
    args = base_parser("Celltypist cell-type annotation").parse_args()
    set_seed(args.seed)
    data = load_synthetic("annotation", args)
    model = Celltypist(majority_voting=False)
    model.preprocess(data)
    x_train, y_train = data.get_train_data()
    model.fit(x_train, y_train.argmax(1))
    x_test, y_test = data.get_test_data()
    print(f"ACC: {model.score(x_test, y_test):.4f}")

"""Reference benchmark reproduction commands (upstream examples/single_modality/cell_type_annotation/celltypist.py):

To reproduce CellTypist benchmarks, please refer to command lines below:

Mouse Brain
$ python celltypist.py --species mouse --tissue Brain --train_dataset 753 3285 --test_dataset 2695

Mouse Spleen
$ python celltypist.py --species mouse --tissue Spleen --train_dataset 1970 --test_dataset 1759

Mouse Kidney
$ python celltypist.py --species mouse --tissue Kidney --train_dataset 4682 --test_dataset 203

These CLIs apply once the raw benchmark data is staged under --data_dir; in
no-egress environments use the synthetic analogs instead, e.g.
``--dataset`` (see examples/_utils.py DATASET_ANALOGS).
"""

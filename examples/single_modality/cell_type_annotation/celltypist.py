"""Celltypist benchmark script (parity: examples/.../celltypist.py)."""
import sys

sys.path.insert(0, __file__.rsplit("/", 3)[0])
import numpy as np

from _utils import annotation_data, base_parser, set_seed
from dance_tpu.modules.single_modality.cell_type_annotation import Celltypist

if __name__ == "__main__":
    args = base_parser("Celltypist cell-type annotation").parse_args()
    set_seed(args.seed)
    data = annotation_data(seed=args.seed)
    model = Celltypist(majority_voting=False)
    model.preprocess(data)
    x_train, y_train = data.get_train_data()
    model.fit(x_train, y_train.argmax(1))
    x_test, y_test = data.get_test_data()
    print(f"ACC: {model.score(x_test, y_test):.4f}")

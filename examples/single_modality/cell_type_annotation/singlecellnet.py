"""SingleCellNet benchmark script (parity: examples/.../singlecellnet.py)."""
import sys

sys.path.insert(0, __file__.rsplit("/", 3)[0])
import numpy as np

from _utils import load_synthetic, annotation_data, base_parser, set_seed
from dance_tpu.modules.single_modality.cell_type_annotation import SingleCellNet

if __name__ == "__main__":
    args = base_parser("SingleCellNet cell-type annotation").parse_args()
    set_seed(args.seed)
    data = load_synthetic("annotation", args)
    model = SingleCellNet(num_trees=100)
    model.preprocess(data)
    x_train, y_train = data.get_train_data()
    model.fit(x_train, y_train.argmax(1))
    x_test, y_test = data.get_test_data()
    print(f"ACC: {model.score(x_test, y_test):.4f}")

"""Reference benchmark reproduction commands (upstream examples/single_modality/cell_type_annotation/singlecellnet.py):

To reproduce SingleCellNet benchmarks, please refer to command lines below:

Mouse Brain
$ python singlecellnet.py --species mouse --tissue Brain --train_dataset 753 --test_dataset 2695

Mouse Spleen
$ python singlecellnet.py --species mouse --tissue Spleen --train_dataset 1970 --test_dataset 1759

Mouse Kidney
$ python singlecellnet.py --species mouse --tissue Kidney --train_dataset 4682 --test_dataset 203

python singlecellnet.py --species human --tissue Brain  --train_dataset 328 --test_dataset 138
python singlecellnet.py --species human --tissue CD8  --train_dataset 1027 1357 1641 517 706 777 850 972  --test_dataset 245 332 377 398 405 455 470 492

python singlecellnet.py --species human --tissue CD4 --train_dataset 1013 1247 598 732 767 768 770 784 845 864 --test_dataset 315 340 376 381 390 404 437 490 551 559
python singlecellnet.py --species human --tissue Spleen  --train_dataset 3043 3777 4029 4115 4362 4657  --test_dataset 1729 2125 2184 2724 2743
python singlecellnet.py --species human --tissue Immune  --train_dataset 11407 1519 636 713 9054 9258 --test_dataset 1925 205 3323 6509 7572

These CLIs apply once the raw benchmark data is staged under --data_dir; in
no-egress environments use the synthetic analogs instead, e.g.
``--dataset`` (see examples/_utils.py DATASET_ANALOGS).
"""

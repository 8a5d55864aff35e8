"""ACTINN benchmark script (parity: examples/.../actinn.py).

Reproduce benchmarks (with pre-staged scDeepSort data):
$ python actinn.py --species mouse --tissue Spleen --train_dataset 1970 --test_dataset 1759
Otherwise runs on synthetic data.
"""
import sys; sys.path.append("..")
import numpy as np

from dance_tpu.modules.single_modality.cell_type_annotation import ACTINN

sys.path.insert(0, __file__.rsplit("/", 3)[0])
from _utils import load_synthetic, annotation_data, base_parser, set_seed

if __name__ == "__main__":
    p = base_parser("ACTINN cell-type annotation")
    p.add_argument("--species", default="mouse")
    p.add_argument("--tissue", default="Spleen")
    p.add_argument("--train_dataset", nargs="+", default=["1970"])
    p.add_argument("--test_dataset", nargs="+", default=["1759"])
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--num_epochs", type=int, default=50)
    p.add_argument("--learning_rate", type=float, default=0.01)
    p.add_argument("--lambd", type=float, default=0.01)
    args = p.parse_args()
    set_seed(args.seed)

    model = ACTINN(lambd=args.lambd, random_seed=args.seed)
    try:
        from dance_tpu.datasets import CellTypeAnnotationDataset
        data = CellTypeAnnotationDataset(
            species=args.species, tissue=args.tissue, data_dir=args.data_dir,
            train_dataset=args.train_dataset, test_dataset=args.test_dataset,
        ).load_data(model.preprocessing_pipeline(), cache=args.cache)
    except FileNotFoundError:
        print("Raw data not staged; using synthetic data")
        data = load_synthetic("annotation", args)
        model.preprocessing_pipeline()(data)
    x_train, y_train = data.get_train_data()
    model.fit(x_train, y_train, batch_size=args.batch_size, lr=args.learning_rate,
              num_epochs=args.num_epochs, seed=args.seed)
    x_test, y_test = data.get_test_data()
    print(f"ACC: {model.score(x_test, y_test):.4f}")

"""Reference benchmark reproduction commands (upstream examples/single_modality/cell_type_annotation/actinn.py):

To reproduce ACTINN benchmarks, please refer to command lines below:

Mouse Brain
$ python actinn.py --species mouse --tissue Brain --train_dataset 753 3285 --test_dataset 2695

Mouse Spleen
$ python actinn.py --species mouse --tissue Spleen --train_dataset 1970 --test_dataset 1759

Mouse Kidney
$ python actinn.py --species mouse --tissue Kidney --train_dataset 4682 --test_dataset 203

These CLIs apply once the raw benchmark data is staged under --data_dir; in
no-egress environments use the synthetic analogs instead, e.g.
``--dataset`` (see examples/_utils.py DATASET_ANALOGS).
"""

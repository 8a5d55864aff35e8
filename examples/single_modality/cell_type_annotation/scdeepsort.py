"""scDeepSort benchmark script (parity: examples/.../scdeepsort.py)."""
import sys

sys.path.insert(0, __file__.rsplit("/", 3)[0])
import numpy as np

from _utils import load_synthetic, annotation_data, base_parser, set_seed
from dance_tpu.modules.single_modality.cell_type_annotation import ScDeepSort

if __name__ == "__main__":
    p = base_parser("scDeepSort cell-type annotation")
    p.add_argument("--dense_dim", type=int, default=50)
    p.add_argument("--hidden_dim", type=int, default=64)
    p.add_argument("--n_layers", type=int, default=1)
    p.add_argument("--n_epochs", type=int, default=100)
    args = p.parse_args()
    set_seed(args.seed)
    data = load_synthetic("annotation", args)
    model = ScDeepSort(args.dense_dim, args.hidden_dim, args.n_layers, seed=args.seed)
    model.preprocess(data, n_components=args.dense_dim)
    graph = data.data.uns["PCACellFeatureGraph"]
    n_genes = graph.info["num_genes"]
    tr = np.concatenate([np.arange(n_genes), n_genes + np.asarray(data.train_idx)])
    g_train = graph.subgraph(tr)
    g_train.info = {"num_genes": n_genes, "num_cells": len(data.train_idx)}
    model.fit(g_train, data.get_y("train").argmax(1), epochs=args.n_epochs)
    te = np.concatenate([np.arange(n_genes), n_genes + np.asarray(data.test_idx)])
    g_test = graph.subgraph(te)
    g_test.info = {"num_genes": n_genes, "num_cells": len(data.test_idx)}
    pred = model.predict(g_test)
    acc = (data.get_y("test").argmax(1) == pred).mean()
    print(f"ACC: {acc:.4f}")

"""Reference benchmark reproduction commands (upstream examples/single_modality/cell_type_annotation/scdeepsort.py):

To reproduce the benchmarking results, please run the following command:

Mouse Brain
$ python scdeepsort.py --species mouse --tissue Brain --train_dataset 753 3285 --test_dataset 2695

Mouse Spleen
$ python scdeepsort.py --species mouse --tissue Spleen --train_dataset 1970 --test_dataset 1759

Mouse Kidney
$ python scdeepsort.py --species mouse --tissue Kidney --train_dataset 4682 --test_dataset 203

These CLIs apply once the raw benchmark data is staged under --data_dir; in
no-egress environments use the synthetic analogs instead, e.g.
``--dataset`` (see examples/_utils.py DATASET_ANALOGS).
"""

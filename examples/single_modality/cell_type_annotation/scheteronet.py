"""scHeteroNet benchmark script (parity: examples/single_modality/
cell_type_annotation/scheteronet.py): closed-set accuracy + novel-cell-type
(OOD) detection via propagated negative energy."""
import sys

sys.path.insert(0, __file__.rsplit("/", 3)[0])
import numpy as np

from _utils import annotation_data, base_parser, set_seed
from dance_tpu.modules.single_modality.cell_type_annotation import scHeteroNet
from dance_tpu.transforms.graph import HeteronetGraph

if __name__ == "__main__":
    p = base_parser("scHeteroNet cell-type annotation + OOD detection")
    p.add_argument("--epochs", type=int, default=120)
    p.add_argument("--knn_num", type=int, default=5)
    p.add_argument("--ood_class", type=int, default=2,
                   help="cell type held out of training as the novel type")
    p.add_argument("--use_bsr", action="store_true",
                   help="force the Pallas BSR path (default: auto-select on TPU)")
    args = p.parse_args()
    set_seed(args.seed)

    data = annotation_data(n_cells=300, n_genes=100, n_types=3, seed=args.seed)
    HeteronetGraph(knn_num=args.knn_num)(data)
    g = data.data.uns["HeteronetGraph"]
    y = data.data.obsm["cell_type"].to_numpy().argmax(1)

    train_idx = np.asarray([i for i in data.train_idx if y[i] != args.ood_class])
    model = scHeteroNet(hidden_channels=32, num_layers=2, seed=args.seed)
    model.fit(g, y, x_raw=np.asarray(data.data.X), epochs=args.epochs,
              train_idx=train_idx, use_bsr=args.use_bsr or "auto")

    test_idx = np.asarray(data.test_idx)
    ind = test_idx[y[test_idx] != args.ood_class]
    ood = test_idx[y[test_idx] == args.ood_class]
    acc = float((model.predict(idx=ind) == y[ind]).mean())
    auroc, aupr, fpr95 = model.evaluate_ood(ind, ood)
    print(f"ACC: {acc:.4f}")
    print(f"OOD AUROC: {auroc:.4f}  AUPR: {aupr:.4f}  FPR@95: {fpr95:.4f}")

"""scHeteroNet benchmark script (parity: examples/single_modality/
cell_type_annotation/scheteronet.py): closed-set accuracy + novel-cell-type
(OOD) detection via propagated negative energy."""
import sys

sys.path.insert(0, __file__.rsplit("/", 3)[0])
import numpy as np

from _utils import load_synthetic, annotation_data, base_parser, set_seed
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

    data = load_synthetic("annotation", args, n_cells=300, n_genes=100, n_types=3)
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

"""Reference benchmark reproduction commands (upstream examples/single_modality/cell_type_annotation/scheteronet.py):

Epoch: 00, Loss: 2.3264, AUROC: 44.03%, AUPR: 99.12%, FPR95: 100.00%, Test Score: 46.85%
Run 01:
Chosen epoch: 4
OOD Test 1 Final AUROC: 64.61
OOD Test 1 Final AUPR: 99.53
OOD Test 1 Final FPR95: 100.00
IND Test Score: 81.88
All runs:
OOD Test 1 Final AUROC: 64.61
OOD Test 1 Final AUPR: 99.53
OOD Test 1 Final FPR: 100.00
IND Test Score: 81.88

python scheteronet.py --gpu -1 --use_zinb --use_prop --use_2hop

python scheteronet.py --gpu -1  --species human --tissue Brain --train_dataset 328 --test_dataset 138 --use_zinb --use_prop --use_2hop
python scheteronet.py --gpu -1  --species human --tissue CD8 --train_dataset 1027 1357 1641 517 706 777 850 972 --test_dataset 245 332 377 398 405 455 470 492 --use_zinb --use_prop --use_2hop
python scheteronet.py --gpu 0  --species human --tissue CD4 --train_dataset 1013 1247 598 732 767 768 770 784 845 864 --test_dataset 315 340 376 381 390 404 437 490 551 559 --use_zinb --use_prop --use_2hop

python scheteronet.py --gpu 0  --species human --tissue Spleen --train_dataset 3043 3777 4029 4115 4362 4657 --test_dataset 1729 2125 2184 2724 2743 --use_zinb --use_prop --use_2hop

python scheteronet.py --gpu 0  --species human --tissue Immune --train_dataset 11407 1519 636 713 9054 9258 --test_dataset 1925 205 3323 6509 7572 --use_zinb --use_prop --use_2hop

These CLIs apply once the raw benchmark data is staged under --data_dir; in
no-egress environments use the synthetic analogs instead, e.g.
``--dataset`` (see examples/_utils.py DATASET_ANALOGS).
"""

"""ScMoGCNWrapper match modality benchmark script (parity: examples/multi_modality/...)."""
import sys

sys.path.insert(0, __file__.rsplit("/", 3)[0])
import numpy as np

from _utils import load_synthetic, base_parser, multimodal_data, set_seed
from dance_tpu.modules.multi_modality.match_modality import ScMoGCNWrapper

if __name__ == "__main__":
    p = base_parser("ScMoGCNWrapper match modality")
    p.add_argument("-tq", "--threshold_quantile", default=0.95, type=float)
    args = p.parse_args()
    set_seed(args.seed)
    data = load_synthetic("multimodal", args, n_cells=240, n_genes=100, n_prot=25)
    x1_tr = np.log1p(data.get_feature(split_name="train", mod="mod1", channel_type="X"))
    x2_tr = np.log1p(data.get_feature(split_name="train", mod="mod2", channel_type="X"))
    x1_te = np.log1p(data.get_feature(split_name="test", mod="mod1", channel_type="X"))
    x2_te = np.log1p(data.get_feature(split_name="test", mod="mod2", channel_type="X"))
    model = ScMoGCNWrapper(latent_dim=32, seed=args.seed)
    model.fit(x1_tr, x2_tr, x1_te, x2_te, epochs=60, batch_size=64)
    matching = model.predict_matching(threshold_quantile=args.threshold_quantile)
    n = matching.shape[0]
    print(f"Matching score: {matching[np.arange(n), np.arange(n)].mean():.4f}")

"""Reference benchmark reproduction commands (upstream examples/multi_modality/match_modality/scmogcn.py):

To reproduce scMoGCN on other samples, please refer to command lines belows:

GEX-ADT (subset):
$ python scmogcn.py --subtask openproblems_bmmc_cite_phase2_rna_subset --threshold_quantile 0.85 --device cuda

GEX-ADT:
$ python scmogcn.py --subtask openproblems_bmmc_cite_phase2_rna --device cuda

GEX-ATAC:
$ python scmogcn.py --subtask openproblems_bmmc_multiome_phase2_rna --device cuda

These CLIs apply once the raw benchmark data is staged under --data_dir; in
no-egress environments use the synthetic analogs instead, e.g.
``--dataset`` (see examples/_utils.py DATASET_ANALOGS).
"""

"""CMAE match modality benchmark script (parity: examples/multi_modality/...)."""
import sys

sys.path.insert(0, __file__.rsplit("/", 3)[0])
import numpy as np

from _utils import load_synthetic, base_parser, multimodal_data, set_seed
from dance_tpu.modules.multi_modality.match_modality import CMAE

if __name__ == "__main__":
    args = base_parser("CMAE match modality").parse_args()
    set_seed(args.seed)
    data = load_synthetic("multimodal", args, n_cells=240, n_genes=100, n_prot=25)
    x1_tr = np.log1p(data.get_feature(split_name="train", mod="mod1", channel_type="X"))
    x2_tr = np.log1p(data.get_feature(split_name="train", mod="mod2", channel_type="X"))
    x1_te = np.log1p(data.get_feature(split_name="test", mod="mod1", channel_type="X"))
    x2_te = np.log1p(data.get_feature(split_name="test", mod="mod2", channel_type="X"))
    model = CMAE(z_dim=16, hidden=64, seed=args.seed)
    model.fit(x1_tr, x2_tr, epochs=300)
    matching = model.predict_matching(x1_te, x2_te)
    print(f"Matching score: {model.score_matching(matching):.4f}")

"""Reference benchmark reproduction commands (upstream examples/multi_modality/match_modality/cmae.py):

To reproduce CMAE on other samples, please refer to command lines belows:

GEX-ADT (subset):
$ python cmae.py --subtask openproblems_bmmc_cite_phase2_rna_subset --device cuda

GEX-ADT:
$ python cmae.py --subtask openproblems_bmmc_cite_phase2_rna --device cuda

GEX-ATAC:
$ python cmae.py --subtask openproblems_bmmc_multiome_phase2_rna --device cuda

These CLIs apply once the raw benchmark data is staged under --data_dir; in
no-egress environments use the synthetic analogs instead, e.g.
``--dataset`` (see examples/_utils.py DATASET_ANALOGS).
"""

"""MMVAE predict modality benchmark script (parity: examples/multi_modality/...)."""
import sys

sys.path.insert(0, __file__.rsplit("/", 3)[0])
import numpy as np

from _utils import load_synthetic, base_parser, multimodal_data, set_seed
from dance_tpu.modules.multi_modality.predict_modality import MMVAE

if __name__ == "__main__":
    args = base_parser("MMVAE predict modality").parse_args()
    set_seed(args.seed)
    data = load_synthetic("multimodal", args)
    x1_tr = np.log1p(data.get_feature(split_name="train", mod="mod1", channel_type="X"))
    x2_tr = np.log1p(data.get_feature(split_name="train", mod="mod2", channel_type="X"))
    x1_te = np.log1p(data.get_feature(split_name="test", mod="mod1", channel_type="X"))
    x2_te = np.log1p(data.get_feature(split_name="test", mod="mod2", channel_type="X"))
    model = MMVAE(seed=args.seed)
    model.fit(np.expm1(x1_tr), x2_tr, epochs=100)
    print(f"RMSE: {model.score(np.expm1(x1_te), x2_te):.4f}")

"""Reference benchmark reproduction commands (upstream examples/multi_modality/predict_modality/scmm.py):

To reproduce scMM on other samples, please refer to command lines belows:

GEX to ADT (subset):
$ python scmm.py --subtask openproblems_bmmc_cite_phase2_rna_subset --device cuda

GEX to ADT:
$ python scmm.py --subtask openproblems_bmmc_cite_phase2_rna --device cuda

ADT to GEX:
$ python scmm.py --subtask openproblems_bmmc_cite_phase2_mod2 --device cuda

GEX to ATAC:
$ python scmm.py --subtask openproblems_bmmc_multiome_phase2_rna --device cuda

ATAC to GEX:
$ python scmm.py --subtask openproblems_bmmc_multiome_phase2_mod2 --device cuda

These CLIs apply once the raw benchmark data is staged under --data_dir; in
no-egress environments use the synthetic analogs instead, e.g.
``--dataset`` (see examples/_utils.py DATASET_ANALOGS).
"""

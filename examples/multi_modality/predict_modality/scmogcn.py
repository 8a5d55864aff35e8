"""ScMoGCNWrapper predict modality benchmark script (parity: examples/multi_modality/...)."""
import sys

sys.path.insert(0, __file__.rsplit("/", 3)[0])
import numpy as np

from _utils import load_synthetic, base_parser, multimodal_data, set_seed
from dance_tpu.modules.multi_modality.predict_modality import ScMoGCNWrapper

if __name__ == "__main__":
    p = base_parser("ScMoGCNWrapper predict modality")
    p.add_argument("--use_bsr", action="store_true",
                   help="force the Pallas BSR path (default: auto-select on TPU)")
    args = p.parse_args()
    set_seed(args.seed)
    data = load_synthetic("multimodal", args)
    x1_tr = np.log1p(data.get_feature(split_name="train", mod="mod1", channel_type="X"))
    x2_tr = np.log1p(data.get_feature(split_name="train", mod="mod2", channel_type="X"))
    x1_te = np.log1p(data.get_feature(split_name="test", mod="mod1", channel_type="X"))
    x2_te = np.log1p(data.get_feature(split_name="test", mod="mod2", channel_type="X"))
    model = ScMoGCNWrapper(seed=args.seed)
    model.fit(np.expm1(x1_tr), x2_tr, x_test=np.expm1(x1_te), epochs=150,
              use_bsr=args.use_bsr or "auto")
    print(f"RMSE: {model.score(np.expm1(x1_te), x2_te):.4f}")

"""Reference benchmark reproduction commands (upstream examples/multi_modality/predict_modality/scmogcn.py):

To reproduce scMoGCN on other samples, please refer to command lines belows:

GEX to ADT (subset):
$ python scmogcn.py --subtask oopenproblems_bmmc_cite_phase2_rna_subset --device cuda

GEX to ADT:
$ python scmogcn.py --subtask oopenproblems_bmmc_cite_phase2_rna --device cuda -inres -sb -hid=256 -wd 1e-4 -pww 'cos' -es 200 -pwth 0.1 -ws -edd 0.4 -mdd 0.3

ADT to GEX:
$ python scmogcn.py --subtask openproblems_bmmc_cite_phase2_mod2 --device cuda -es 300

GEX to ATAC:
$ python scmogcn.py --subtask openproblems_bmmc_multiome_phase2_rna --device cuda -es 300

ATAC to GEX:
$ python scmogcn.py --subtask openproblems_bmmc_multiome_phase2_mod2 --device cuda -es 1000 -e 3000 -edd 0

These CLIs apply once the raw benchmark data is staged under --data_dir; in
no-egress environments use the synthetic analogs instead, e.g.
``--dataset`` (see examples/_utils.py DATASET_ANALOGS).
"""

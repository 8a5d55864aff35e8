"""DCCA joint embedding benchmark script (parity: examples/multi_modality/...)."""
import sys

sys.path.insert(0, __file__.rsplit("/", 3)[0])
import numpy as np

from _utils import load_synthetic, base_parser, multimodal_data, set_seed
from dance_tpu.modules.multi_modality.joint_embedding import DCCA

if __name__ == "__main__":
    ap = base_parser("DCCA joint embedding")
    ap.add_argument("--epochs", type=int, default=200)
    args = ap.parse_args()
    set_seed(args.seed)
    data = load_synthetic("multimodal", args)
    x1_tr = np.log1p(data.get_feature(split_name="train", mod="mod1", channel_type="X"))
    x2_tr = np.log1p(data.get_feature(split_name="train", mod="mod2", channel_type="X"))
    x1_te = np.log1p(data.get_feature(split_name="test", mod="mod1", channel_type="X"))
    x2_te = np.log1p(data.get_feature(split_name="test", mod="mod2", channel_type="X"))
    ct = data.get_feature(split_name="train", mod="mod1", channel="cell_type", channel_type="obs")
    # modality-2 likelihood follows the data: Bernoulli for binary (ATAC
    # peaks), NB for counts (ADT) — matching the reference's per-subtask types
    raw2 = np.expm1(x2_tr)
    binary = float(raw2.max()) <= 1.0
    model = DCCA(Type_2="Bernoulli" if binary else "NB", seed=args.seed)
    model.fit(x1_tr, x2_tr, x_mod2_raw=None if binary else raw2,
              epochs=args.epochs)
    print(f"NMI: {model.score(None, ct):.4f}")

"""Reference benchmark reproduction commands (upstream examples/multi_modality/joint_embedding/dcca.py):

To reproduce DCCA on other samples, please refer to command lines belows:

GEX-ADT:
$ python dcca.py --subtask openproblems_bmmc_cite_phase2 --device cuda

GEX-ATAC:
$ python dcca.py --subtask openproblems_bmmc_multiome_phase2 --device cuda

These CLIs apply once the raw benchmark data is staged under --data_dir; in
no-egress environments use the synthetic analogs instead, e.g.
``--dataset`` (see examples/_utils.py DATASET_ANALOGS).
"""

"""ScMoGCN v2 joint embedding benchmark script (parity: examples/
multi_modality/joint_embedding/scmogcnv2.py — the structured-latent GNN
trunk with auxiliary cell-type / cell-cycle heads and feature-sampled
minibatch training; see dance_tpu scmogcnv2.ScMoGCNWrapperV2)."""
import sys

sys.path.insert(0, __file__.rsplit("/", 3)[0])
import numpy as np

from _utils import load_synthetic, base_parser, multimodal_data, set_seed
from dance_tpu.modules.multi_modality.joint_embedding.scmogcnv2 import ScMoGCNWrapperV2

if __name__ == "__main__":
    p = base_parser("ScMoGCN v2 joint embedding")
    p.add_argument("--epochs", type=int, default=60)
    args = p.parse_args()
    set_seed(args.seed)
    data = load_synthetic("multimodal", args)
    x1 = np.log1p(data.get_feature(split_name="train", mod="mod1", channel_type="X"))
    x2 = np.log1p(data.get_feature(split_name="train", mod="mod2", channel_type="X"))
    ct = data.get_feature(split_name="train", mod="mod1", channel="cell_type",
                          channel_type="obs")
    model = ScMoGCNWrapperV2(seed=args.seed)
    model.fit(x1, x2, cell_type=ct, epochs=args.epochs)
    print(f"NMI: {model.score(None, ct):.4f}")

"""Reference benchmark reproduction commands (upstream examples/multi_modality/joint_embedding/scmogcnv2.py:43 (argparse default; upstream carries no reproduce block)):

Default benchmark:
$ python scmogcnv2.py --subtask openproblems_bmmc_cite_phase2 --device cuda

These CLIs apply once the raw benchmark data is staged; in no-egress
environments use the synthetic analogs instead (examples/_utils.py
DATASET_ANALOGS).
"""

"""scMoGNN v2 joint embedding (parity: dance/modules/multi_modality/
joint_embedding/scmogcnv2.py:325,:933).

The v2 recipe (auxiliary supervised heads over the bipartite GNN trunk) is the
implementation served by :mod:`.scmogcn`; this module keeps the reference
import path.
"""

from dance_tpu.modules.multi_modality.joint_embedding.scmogcn import (_JENet,
                                                                      ScMoGCNWrapper)

ScMoGCNWrapperV2 = ScMoGCNWrapper

__all__ = ["ScMoGCNWrapper", "ScMoGCNWrapperV2"]

"""Joint embedding (parity: dance/modules/multi_modality/joint_embedding)."""

from dance_tpu.modules.multi_modality.joint_embedding.dcca import DCCA
from dance_tpu.modules.multi_modality.joint_embedding.jae import JAEWrapper
from dance_tpu.modules.multi_modality.joint_embedding.scmogcn import ScMoGCNWrapper
from dance_tpu.modules.multi_modality.joint_embedding.scmvae import scMVAE

__all__ = ["DCCA", "JAEWrapper", "ScMoGCNWrapper", "scMVAE"]

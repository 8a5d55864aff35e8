"""Modality matching (parity: dance/modules/multi_modality/match_modality)."""

from dance_tpu.modules.multi_modality.match_modality.cmae import CMAE
from dance_tpu.modules.multi_modality.match_modality.scmm import MMVAE
from dance_tpu.modules.multi_modality.match_modality.scmogcn import ScMoGCNWrapper

__all__ = ["CMAE", "MMVAE", "ScMoGCNWrapper"]

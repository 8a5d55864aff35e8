"""Modality prediction (parity: dance/modules/multi_modality/predict_modality)."""

from dance_tpu.modules.multi_modality.predict_modality.babel import BabelWrapper
from dance_tpu.modules.multi_modality.predict_modality.cmae import CMAE
from dance_tpu.modules.multi_modality.predict_modality.scmm import MMVAE
from dance_tpu.modules.multi_modality.predict_modality.scmogcn import ScMoGCNWrapper

__all__ = ["BabelWrapper", "CMAE", "MMVAE", "ScMoGCNWrapper"]

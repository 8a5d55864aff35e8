"""Imputation methods (parity: dance/modules/single_modality/imputation)."""

from dance_tpu.modules.single_modality.imputation.deepimpute import DeepImpute
from dance_tpu.modules.single_modality.imputation.graphsci import GraphSCI
from dance_tpu.modules.single_modality.imputation.magic import MAGIC
from dance_tpu.modules.single_modality.imputation.scgnn2 import ScGNN2

__all__ = ["DeepImpute", "GraphSCI", "MAGIC", "ScGNN2"]

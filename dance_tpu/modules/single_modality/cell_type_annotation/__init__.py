"""Cell-type annotation methods (parity: dance/modules/single_modality/cell_type_annotation)."""

from dance_tpu.modules.single_modality.cell_type_annotation.actinn import ACTINN
from dance_tpu.modules.single_modality.cell_type_annotation.celltypist import Celltypist
from dance_tpu.modules.single_modality.cell_type_annotation.scdeepsort import ScDeepSort
from dance_tpu.modules.single_modality.cell_type_annotation.scheteronet import scHeteroNet
from dance_tpu.modules.single_modality.cell_type_annotation.singlecellnet import SingleCellNet
from dance_tpu.modules.single_modality.cell_type_annotation.svm import SVM

__all__ = ["ACTINN", "Celltypist", "SVM", "ScDeepSort", "SingleCellNet", "scHeteroNet"]

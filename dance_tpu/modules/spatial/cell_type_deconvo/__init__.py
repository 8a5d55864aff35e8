"""Cell-type deconvolution (parity: dance/modules/spatial/cell_type_deconvo)."""

from dance_tpu.modules.spatial.cell_type_deconvo.card import Card
from dance_tpu.modules.spatial.cell_type_deconvo.dstg import DSTG
from dance_tpu.modules.spatial.cell_type_deconvo.spatialdecon import SpatialDecon
from dance_tpu.modules.spatial.cell_type_deconvo.spotlight import SPOTlight
from dance_tpu.modules.spatial.cell_type_deconvo.stdgcn import StdGCN, stdGCNWrapper

__all__ = ["Card", "DSTG", "SPOTlight", "SpatialDecon", "StdGCN", "stdGCNWrapper"]

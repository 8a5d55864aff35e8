"""Preprocessing transform catalog (parity: dance/transforms/__init__.py:66-135).

Importing this package registers every transform under its
``preprocessor.<type>.<subtype>`` scope (SURVEY.md Appendix A).
"""

from dance_tpu.transforms import graph
from dance_tpu.transforms.base import AnnDataAdaptor, BaseTransform
from dance_tpu.transforms.cell_feature import (BatchFeature, CellPCA, CellSparsePCA,
                                               CellSVD, FeatureCellPlaceHolder,
                                               GaussRandProjFeature, WeightedFeaturePCA,
                                               WeightedFeatureSVD)
from dance_tpu.transforms.filter import (FilterCellsCommonMod, FilterCellsPlaceHolder,
                                         FilterCellsScanpy, FilterCellsScanpyOrder,
                                         FilterCellsType, FilterCellTransform,
                                         FilterGenesCommon, FilterGenesMarker,
                                         FilterGenesMarkerGini, FilterGenesMatch,
                                         FilterGenesNumberPlaceHolder,
                                         FilterGenesPercentile, FilterGenesPlaceHolder,
                                         FilterGenesRegression, FilterGenesScanpy,
                                         FilterGenesScanpyOrder, FilterGenesTopK,
                                         FilterScanpy, HighlyVariableGenesLogarithmizedByMeanAndDisp,
                                         HighlyVariableGenesLogarithmizedByTopGenes,
                                         HighlyVariableGenesRawCount, ScrubletTransform)
from dance_tpu.transforms.gene_holdout import GeneHoldout
from dance_tpu.transforms.interface import AnnDataTransform
from dance_tpu.transforms.mask import CellwiseMaskData, MaskData
from dance_tpu.transforms.misc import (AlignMod, Compose, RemoveSplit, SaveRaw, SetConfig,
                                       UpdateRaw)
from dance_tpu.transforms.normalize import (ColumnSumNormalize, Log1P, NormalizePlaceHolder,
                                            NormalizeTotal, NormalizeTotalLog1P,
                                            ScTransform, ScTransformR, UpdateSizeFactors,
                                            tfidfTransform)
from dance_tpu.transforms.pseudobulk import (CellGiottoTopicProfile, CellTopicProfile,
                                             CellTypeNums, PseudoMixture)
from dance_tpu.transforms.sc3_feature import SC3Feature
from dance_tpu.transforms.scn_feature import SCNFeature
from dance_tpu.transforms.spatial_feature import (MorphologyFeatureCNN, SMEFeature,
                                                  SpatialIDEFeature, TangramFeature)
from dance_tpu.transforms.stats import GeneStats

__all__ = [
    "AlignMod", "AnnDataAdaptor", "AnnDataTransform", "BaseTransform", "BatchFeature",
    "CellGiottoTopicProfile", "CellPCA", "CellSparsePCA", "CellSVD", "CellTopicProfile",
    "CellTypeNums", "CellwiseMaskData", "ColumnSumNormalize", "Compose",
    "FeatureCellPlaceHolder", "FilterCellTransform", "FilterCellsCommonMod",
    "FilterCellsPlaceHolder", "FilterCellsScanpy", "FilterCellsScanpyOrder",
    "FilterCellsType", "FilterGenesCommon", "FilterGenesMarker", "FilterGenesMarkerGini",
    "FilterGenesMatch", "FilterGenesNumberPlaceHolder", "FilterGenesPercentile",
    "FilterGenesPlaceHolder", "FilterGenesRegression", "FilterGenesScanpy",
    "FilterGenesScanpyOrder", "FilterGenesTopK", "FilterScanpy", "GaussRandProjFeature",
    "GeneHoldout", "GeneStats", "HighlyVariableGenesLogarithmizedByMeanAndDisp",
    "HighlyVariableGenesLogarithmizedByTopGenes", "HighlyVariableGenesRawCount", "Log1P",
    "MaskData", "MorphologyFeatureCNN", "NormalizePlaceHolder", "NormalizeTotal",
    "NormalizeTotalLog1P", "PseudoMixture", "RemoveSplit", "SC3Feature", "SCNFeature",
    "SMEFeature", "SaveRaw", "ScTransform", "ScTransformR", "ScrubletTransform",
    "SetConfig", "SpatialIDEFeature", "TangramFeature", "UpdateRaw", "UpdateSizeFactors",
    "WeightedFeaturePCA", "WeightedFeatureSVD", "graph", "tfidfTransform",
]

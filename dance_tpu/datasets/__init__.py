"""Dataset acquisition + caching layer (parity: dance/datasets/)."""

from dance_tpu.datasets.base import BaseDataset
from dance_tpu.datasets.multimodality import (JointEmbeddingNIPSDataset,
                                              ModalityMatchingDataset,
                                              ModalityPredictionDataset,
                                              MultiModalityDataset)
from dance_tpu.datasets.singlemodality import (CellTypeAnnotationDataset,
                                               ClusteringDataset, ImputationDataset)
from dance_tpu.datasets.spatial import CellTypeDeconvoDataset, SpatialLIBDDataset

__all__ = ["BaseDataset", "CellTypeAnnotationDataset", "CellTypeDeconvoDataset",
           "ClusteringDataset", "ImputationDataset", "JointEmbeddingNIPSDataset",
           "ModalityMatchingDataset", "ModalityPredictionDataset",
           "MultiModalityDataset", "SpatialLIBDDataset"]

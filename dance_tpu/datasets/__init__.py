"""Dataset acquisition + caching layer (parity: dance/datasets/)."""

from dance_tpu.datasets.base import BaseDataset
from dance_tpu.datasets.singlemodality import (CellTypeAnnotationDataset, ClusteringDataset,
                                               ImputationDataset)

__all__ = ["BaseDataset", "CellTypeAnnotationDataset", "ClusteringDataset",
           "ImputationDataset"]

"""Louvain spatial-domain identification (parity: dance/modules/spatial/
spatial_domain/louvain.py:328).

The reference vendors python-louvain; here the first-party Louvain from
:mod:`dance_tpu.ops.cluster` runs on the neighbor-graph connectivities.
"""

import numpy as np
import scipy.sparse as sp

from dance_tpu.modules.base import BaseClusteringMethod
from dance_tpu.transforms import AnnDataTransform, CellPCA, Compose, SetConfig
from dance_tpu.transforms.graph import NeighborGraph
from dance_tpu.typing import LogLevel, Optional


class Louvain(BaseClusteringMethod):

    _DISPLAY_ATTRS = ("resolution",)

    def __init__(self, resolution: float = 1.0, seed: int = 0):
        self.resolution = resolution
        self.seed = seed

    @staticmethod
    def preprocessing_pipeline(dim: int = 50, n_neighbors: int = 17,
                               log_level: LogLevel = "INFO"):
        return Compose(
            AnnDataTransform("sc.pp.normalize_total", target_sum=1e4),
            AnnDataTransform("sc.pp.log1p"),
            CellPCA(n_components=dim),
            NeighborGraph(n_neighbors=n_neighbors),
            SetConfig({"feature_channel": "NeighborGraph",
                       "feature_channel_type": "obsp", "label_channel": "label",
                       "label_channel_type": "obs"}),
            log_level=log_level,
        )

    def fit(self, adj, partition=None, weight="weight", randomize=None,
            random_state: Optional[int] = None):
        from dance_tpu.ops.cluster import louvain
        self.pred = louvain(sp.csr_matrix(adj), resolution=self.resolution,
                            seed=random_state if random_state is not None else self.seed)
        return self

    def predict(self, x=None):
        return self.pred

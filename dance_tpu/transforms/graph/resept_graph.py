"""RESEPT spatial graph (parity: dance/transforms/graph/resept_graph.py:13;
unregistered in the reference as well)."""

import numpy as np
import scipy.sparse as sp

from dance_tpu.transforms.base import BaseTransform
from dance_tpu.typing import Optional


class RESEPTGraph(BaseTransform):
    """kNN spatial graph weighted by expression-embedding similarity."""

    _DISPLAY_ATTRS = ("n_neighbors",)

    def __init__(self, n_neighbors: int = 10, channel: str = "spatial",
                 feature_channel: Optional[str] = "CellPCA", **kwargs):
        super().__init__(**kwargs)
        self.n_neighbors = n_neighbors
        self.channel = channel
        self.feature_channel = feature_channel

    def __call__(self, data):
        from dance_tpu.ops.neighbors import knn_graph
        xy = np.asarray(data.get_feature(return_type="numpy", channel=self.channel,
                                         channel_type="obsm"), np.float32)
        adj = knn_graph(xy, min(self.n_neighbors, len(xy) - 1), mode="connectivity",
                        include_self=False)
        if self.feature_channel is not None and \
                self.feature_channel in data.data.obsm:
            feat = np.asarray(data.data.obsm[self.feature_channel], np.float64)
            fn = feat / np.maximum(np.linalg.norm(feat, axis=1, keepdims=True), 1e-12)
            sim = np.clip(fn @ fn.T, 0, None)
            adj = sp.csr_matrix(adj.multiply(sim))
        data.data.obsp[self.out] = sp.csr_matrix(adj)
        return data

"""scHeteroNet cell kNN graph (parity: dance/transforms/graph/heteronet_graph.py)."""

import numpy as np
import scipy.sparse as sp

from dance_tpu.graph import Graph
from dance_tpu.registry import register_preprocessor
from dance_tpu.transforms.base import BaseTransform
from dance_tpu.typing import Optional


@register_preprocessor("graph", "cell")
class HeteronetGraph(BaseTransform):
    """kNN cell graph with node features for HeteroNet (parity: :14)."""

    _DISPLAY_ATTRS = ("knn_num", "distance_metrics")

    def __init__(self, knn_num: int = 5, distance_metrics: str = "l2",
                 random_state: int = 0, channel: Optional[str] = None,
                 channel_type: Optional[str] = "X", ignore_first: bool = False,
                 **kwargs):
        super().__init__(**kwargs)
        self.knn_num = knn_num
        self.distance_metrics = distance_metrics
        self.random_state = random_state
        self.channel = channel
        self.channel_type = channel_type
        self.ignore_first = ignore_first

    def __call__(self, data):
        from dance_tpu.ops.neighbors import knn_graph
        feat = np.asarray(data.get_feature(return_type="numpy", channel=self.channel,
                                           channel_type=self.channel_type),
                          dtype=np.float32)
        adj = knn_graph(feat, min(self.knn_num, feat.shape[0] - 1),
                        mode="connectivity", include_self=False, symmetrize=True)
        g = Graph(sp.csr_matrix(adj), info={"num_cells": feat.shape[0]})
        g.ndata["feat"] = feat
        data.data.uns[self.out] = g
        return data

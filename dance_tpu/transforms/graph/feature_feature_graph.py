"""Gene-gene correlation graph (parity: dance/transforms/graph/feature_feature_graph.py)."""

import numpy as np
import scipy.sparse as sp
from scipy.stats import spearmanr

from dance_tpu.graph import Graph
from dance_tpu.registry import register_preprocessor
from dance_tpu.transforms.base import BaseTransform
from dance_tpu.typing import Any, Dict, Optional
from dance_tpu.utils.matrix import dist_to_rbf


@register_preprocessor("graph", "feature")
class FeatureFeatureGraph(BaseTransform):
    """Thresholded feature-feature similarity graph for GraphSCI (parity: :15).

    Edge weights are GCN-normalized (D^-1/2 A D^-1/2) when ``normalize_edges``.
    """

    _DISPLAY_ATTRS = ("threshold", "positive_only", "normalize_edges", "score_func")

    def __init__(self, threshold: float = 0.3, *, positive_only: bool = False,
                 normalize_edges: bool = True, score_func: str = "pearson",
                 score_func_kwargs: Optional[Dict[str, Any]] = None, **kwargs):
        super().__init__(**kwargs)
        self.threshold = threshold
        self.positive_only = positive_only
        self.normalize_edges = normalize_edges
        self.score_func = score_func
        self.score_func_kwargs = score_func_kwargs or {}

    def __call__(self, data):
        feat = np.asarray(data.get_feature(return_type="numpy"), dtype=np.float64)
        if self.score_func == "pearson":
            adj = np.corrcoef(feat.T)
        elif self.score_func == "spearman":
            adj = spearmanr(feat, axis=0)[0]
            adj = np.atleast_2d(adj)
        elif self.score_func == "rbf":
            norm_vec = np.power(feat, 2).sum(0, keepdims=True)
            dist = np.sqrt((norm_vec + norm_vec.T - 2 * feat.T @ feat).clip(0))
            adj = dist_to_rbf(dist, **self.score_func_kwargs)
        else:
            raise ValueError(f"Unknown score function {self.score_func!r}; "
                             "options: pearson, spearman, rbf")
        adj = np.asarray(adj, dtype=np.float32)
        adj[(adj > -self.threshold) & (adj < self.threshold)] = 0
        if self.positive_only:
            adj[adj < 0] = 0
        # unweighted connectivity with GCN normalization (reference uses weight=1)
        conn = sp.csr_matrix((np.abs(adj) > 0).astype(np.float32))
        g = Graph(conn, info={"num_features": feat.shape[1]})
        g.ndata["feat"] = feat.T.astype(np.float32)
        if self.normalize_edges:
            g.normalize_edges_sym()
        data.data.uns[self.out] = g
        return data

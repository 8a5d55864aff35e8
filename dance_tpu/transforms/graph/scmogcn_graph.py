"""scMoGNN graph construction (parity: dance/transforms/graph/scmogcn_graph.py).

Builds the cell-feature bipartite graph over concatenated modalities, with
optional pathway-aggregated feature nodes (the reference's pathway .gmt
aggregation, graph_construct.py:169) expressed as extra feature-group nodes.
"""

import numpy as np
import scipy.sparse as sp

from dance_tpu.graph import Graph
from dance_tpu.registry import register_preprocessor
from dance_tpu.transforms.base import BaseTransform
from dance_tpu.typing import Dict, List, Optional


@register_preprocessor("graph", "cell")
class ScMoGNNGraph(BaseTransform):
    """Cell-feature bipartite graph for scMoGNN (parity: scmogcn_graph.py:231)."""

    _DISPLAY_ATTRS = ("mod",)

    def __init__(self, mod: Optional[str] = "mod1",
                 pathways: Optional[Dict[str, List[str]]] = None, **kwargs):
        super().__init__(**kwargs)
        self.mod = mod
        self.pathways = pathways

    def __call__(self, data):
        feat = data.get_feature(return_type="sparse", mod=self.mod, channel_type="X")
        feat = sp.csr_matrix(feat)
        n_cells, n_feats = feat.shape
        adj_blocks = [feat]
        extra = 0
        if self.pathways:
            var_names = list((data.data.mod[self.mod] if self.mod else data.data)
                             .var_names)
            name_to_idx = {n: i for i, n in enumerate(var_names)}
            cols = []
            for genes in self.pathways.values():
                idx = [name_to_idx[g] for g in genes if g in name_to_idx]
                col = np.zeros((n_cells, 1), np.float32)
                if idx:
                    col[:, 0] = np.asarray(feat[:, idx].sum(1)).ravel()
                cols.append(col)
            if cols:
                adj_blocks.append(sp.csr_matrix(np.concatenate(cols, axis=1)))
                extra = len(cols)
        full = sp.hstack(adj_blocks).tocsr()
        n_total = n_feats + extra
        n = n_cells + n_total
        coo = full.tocoo()
        src = np.concatenate([coo.row + n_total, coo.col])
        dst = np.concatenate([coo.col, coo.row + n_total])
        w = np.concatenate([coo.data, coo.data]).astype(np.float32)
        adj = sp.csr_matrix((w, (dst, src)), shape=(n, n))
        g = Graph(adj, info={"num_cells": n_cells, "num_genes": n_total,
                             "num_pathways": extra})
        data.data.uns[self.out] = g
        return data

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


# --------------------------------------------------------------------------
# reference-named functional surface (parity: scmogcn_graph.py:18-229)
# --------------------------------------------------------------------------

def read_gmt(entrez_string: str, symbol_string: str):
    """Parse paired MSigDB .gmt dumps into {set name: [gene symbols]}
    (parity: scmogcn_graph.py:18). The entrez file fixes which tokens are set
    names; the symbols file is then keyed on those names."""
    from collections import defaultdict

    gene_sets_entrez = defaultdict(list)
    indicator = 0
    gene_set_name = None
    for ele in entrez_string.split():
        if ele.isnumeric():
            gene_sets_entrez[gene_set_name].append(ele)
        elif indicator == 1:
            indicator = 0
        else:
            indicator = 1
            gene_set_name = ele

    gene_sets_symbols = defaultdict(list)
    for ele in symbol_string.split():
        if ele in gene_sets_entrez:
            gene_set_name = ele
        elif not ele.startswith("http://"):
            gene_sets_symbols[gene_set_name].append(ele)
    return gene_sets_symbols


def create_pathway_graph(gex_features, gene_names, pathway_weight: str,
                         pathway_threshold: float, subtask: str,
                         pathway_path: str, cache: bool = False):
    """Pathway co-membership edges with similarity weights
    (parity: scmogcn_graph.py:43). Returns ``(uu, vv, ee)`` edge lists.

    Vectorized per pathway instead of the reference's cubic python loops;
    ``cache=True`` reproduces the reference's ``pw_{subtask}_{weight}.pkl``
    side-channel (off by default)."""
    import os
    import pickle

    from scipy.stats import rankdata

    pk_path = f"pw_{subtask}_{pathway_weight}.pkl"
    if cache and os.path.exists(pk_path):
        with open(pk_path, "rb") as fh:
            uu, vv, ee = pickle.load(fh)
    else:
        with open(pathway_path + ".entrez.gmt") as gmt:
            entrez_string = gmt.read()
        with open(pathway_path + ".symbols.gmt") as gmt:
            symbols_string = gmt.read()
        gene_sets = read_gmt(entrez_string, symbols_string)
        gene_names = list(gene_names)
        name_to_idx = {n: i for i, n in enumerate(gene_names)}
        pathways = [[name_to_idx[g] for g in genes if g in name_to_idx]
                    for genes in gene_sets.values()]

        dense = np.asarray(gex_features.todense()
                           if sp.issparse(gex_features) else gex_features,
                           dtype=np.float64)
        if pathway_weight == "pearson":
            sim_all = 1 - np.corrcoef(dense.T)
        elif pathway_weight == "spearman":
            ranks = rankdata(dense, axis=0)
            sim_all = 1 - np.corrcoef(ranks.T)
        else:
            sim_all = None

        uu, vv, ee = [], [], []
        norms = np.sqrt((dense ** 2).sum(0))
        for idx in pathways:
            if len(idx) < 2:
                continue
            idx = np.asarray(idx)
            if pathway_weight == "one":
                block = np.ones((len(idx), len(idx)))
            elif pathway_weight == "cos":
                sub = dense[:, idx]
                block = (sub.T @ sub) / np.maximum(
                    np.outer(norms[idx], norms[idx]), 1e-12)
            elif pathway_weight in ("pearson", "spearman"):
                block = sim_all[np.ix_(idx, idx)]
            else:
                raise ValueError(f"unknown pathway_weight {pathway_weight!r}")
            jj, kk = np.nonzero(~np.eye(len(idx), dtype=bool))
            uu.extend(idx[jj].tolist())
            vv.extend(idx[kk].tolist())
            ee.extend(block[jj, kk].tolist())
        if cache:
            with open(pk_path, "wb") as fh:
                pickle.dump([uu, vv, ee], fh)

    keep = [i for i in range(len(uu)) if abs(ee[i]) > pathway_threshold]
    return ([uu[i] for i in keep], [vv[i] for i in keep],
            [ee[i] for i in keep])


def construct_enhanced_feature_graph(u, v, e, train_size, feature_size,
                                     cell_node_features, inductive=False,
                                     enhance_graph=None, _test_graph=False):
    """Cell-feature bipartite graph (+ optional pathway feature-feature edges)
    as a :class:`dance_tpu.graph.Graph` (parity: scmogcn_graph.py:157).

    Node layout: features [0, n_feat) then cells [n_feat, n_feat+n_cell), the
    framework's bipartite convention; edge weights carried on the adjacency.
    ``ndata['id']`` holds the (possibly train-sliced, per ``inductive``) cell
    features for cell nodes and feature indices for feature nodes."""
    from dance_tpu.graph import Graph

    u = np.asarray(u, np.int64)
    v = np.asarray(v, np.int64)
    e = np.asarray(e, np.float32)
    cell_node_features = np.asarray(cell_node_features)
    if inductive and not _test_graph:
        cell_node_features = cell_node_features[:train_size]
    n_cells = int(u.max()) + 1 if len(u) else len(cell_node_features)
    n_feat = int(feature_size)
    n = n_feat + n_cells
    src = np.concatenate([u + n_feat, v])
    dst = np.concatenate([v, u + n_feat])
    w = np.concatenate([e, e])
    if enhance_graph is not None:
        uu, vv, ee = enhance_graph
        src = np.concatenate([src, np.asarray(uu, np.int64)])
        dst = np.concatenate([dst, np.asarray(vv, np.int64)])
        w = np.concatenate([w, np.asarray(ee, np.float32)])
    adj = sp.csr_matrix((w, (dst, src)), shape=(n, n))
    ndata = {"cell_id": np.concatenate([np.arange(n_feat),
                                        -np.ones(n_cells, np.int64)])}
    g = Graph(adj, ndata=ndata,
              info={"num_cells": n_cells, "num_genes": n_feat,
                    "cell_node_features": cell_node_features})
    return g

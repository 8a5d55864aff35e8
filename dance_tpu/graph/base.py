"""Graph containers: host-side construction, device-side message passing.

Replaces DGL graphs (e.g. cell-gene bipartite graph,
dance/transforms/graph/cell_feature_graph.py:34-79) with CSR arrays that XLA
can tile. The bipartite cell-gene graph is represented homogeneously: gene
nodes first (0..n_genes-1) then cell nodes, matching the reference layout.
"""

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from dance_tpu.ops.sparse import CSRMatrix, csr_from_scipy


class DeviceGraph(NamedTuple):
    """Pytree of device arrays: adjacency + node features."""

    adj: CSRMatrix                 # (n, n) weighted adjacency (row = dst is src-major)
    ndata: Dict[str, jax.Array]    # node feature dict

    @property
    def num_nodes(self) -> int:
        return self.adj.shape[0]


class Graph:
    """Host-side graph: scipy CSR adjacency + numpy node data."""

    def __init__(self, adj: sp.spmatrix, ndata: Optional[Dict[str, np.ndarray]] = None,
                 info: Optional[dict] = None):
        self.adj = sp.csr_matrix(adj)
        self.ndata: Dict[str, np.ndarray] = dict(ndata or {})
        self.info = dict(info or {})  # e.g. num_cells / num_genes for bipartite layouts

    # --- construction -----------------------------------------------------

    @classmethod
    def from_cell_feature_matrix(cls, feat, cell_feature: np.ndarray,
                                 gene_feature: np.ndarray, *,
                                 normalize_edges: bool = True,
                                 add_self_loop: bool = True) -> "Graph":
        """Undirected cell-gene bipartite graph from nonzero expression.

        Node layout: genes [0, n_genes) then cells [n_genes, n_genes+n_cells),
        per the reference (cell_feature_graph.py:44-58). ``ndata['features']``
        stacks gene then cell features; ``feat_id``/``cell_id`` mark node types.
        """
        feat = sp.csr_matrix(feat)
        n_cells, n_genes = feat.shape
        n = n_cells + n_genes
        coo = feat.tocoo()
        rows = coo.row + n_genes  # cell nodes offset by gene nodes
        cols = coo.col
        w = coo.data.astype(np.float32)
        # undirected: both directions
        src = np.concatenate([rows, cols])
        dst = np.concatenate([cols, rows])
        ww = np.concatenate([w, w])
        adj = sp.csr_matrix((ww, (dst, src)), shape=(n, n))  # row = destination
        g = cls(adj, info={"num_cells": n_cells, "num_genes": n_genes})
        if normalize_edges:
            g.normalize_edges_by_in_degree()
        if add_self_loop:
            g.add_self_loop(1.0)
        gene_id = np.concatenate([np.arange(n_genes, dtype=np.int32),
                                  -np.ones(n_cells, dtype=np.int32)])
        cell_id = np.concatenate([-np.ones(n_genes, dtype=np.int32),
                                  np.arange(n_cells, dtype=np.int32)])
        g.ndata["cell_id"] = gene_id  # reference naming quirk kept (cell_id = gene idx)
        g.ndata["feat_id"] = cell_id
        g.ndata["features"] = np.vstack([np.asarray(gene_feature, np.float32),
                                         np.asarray(cell_feature, np.float32)])
        return g

    @classmethod
    def from_adjacency(cls, adj, features: Optional[np.ndarray] = None, **info) -> "Graph":
        g = cls(adj, info=info)
        if features is not None:
            g.ndata["features"] = np.asarray(features, np.float32)
        return g

    # --- mutation ---------------------------------------------------------

    def add_self_loop(self, weight: float = 1.0) -> "Graph":
        n = self.adj.shape[0]
        self.adj = (self.adj + sp.diags(np.full(n, weight, np.float32))).tocsr()
        return self

    def normalize_edges_by_in_degree(self) -> "Graph":
        """In-edge weights of each node normalized to sum to its in-degree
        (parity: cell_feature_graph.py:62-69; rows are destinations)."""
        in_deg = np.diff(self.adj.indptr).astype(np.float32)
        row_sums = np.asarray(self.adj.sum(axis=1)).ravel()
        scale = np.divide(in_deg, row_sums, out=np.zeros_like(row_sums),
                          where=row_sums != 0)
        self.adj = (sp.diags(scale) @ self.adj).tocsr()
        return self

    def normalize_edges_sym(self) -> "Graph":
        """Symmetric D^-1/2 A D^-1/2 normalization (GCN flavor)."""
        deg = np.asarray(self.adj.sum(axis=1)).ravel()
        dinv = 1.0 / np.sqrt(np.maximum(deg, 1e-12))
        self.adj = (sp.diags(dinv) @ self.adj @ sp.diags(dinv)).tocsr()
        return self

    def normalize_edges_row(self) -> "Graph":
        """Row-stochastic D^-1 A normalization (mean aggregation)."""
        deg = np.asarray(self.adj.sum(axis=1)).ravel()
        self.adj = (sp.diags(1.0 / np.maximum(deg, 1e-12)) @ self.adj).tocsr()
        return self

    # --- views ------------------------------------------------------------

    @property
    def num_nodes(self) -> int:
        return self.adj.shape[0]

    @property
    def num_edges(self) -> int:
        return self.adj.nnz

    def subgraph(self, node_idx: np.ndarray) -> "Graph":
        node_idx = np.asarray(node_idx)
        sub = Graph(self.adj[node_idx][:, node_idx],
                    {k: v[node_idx] for k, v in self.ndata.items()}, dict(self.info))
        return sub

    def to_device(self, dtype=jnp.float32) -> DeviceGraph:
        # inside fit_distributed's dp_context, node features shard their node
        # axis over the mesh (no padding: rows must stay in sync with adj);
        # the adjacency here replicates — models that support the partitioned
        # sparse path (scDeepSort, graph-sc) build a block-row ShardedCSR
        # (parallel.sharded_graph) instead of using this CSR under dp
        from dance_tpu.parallel.mesh import to_device as place
        return DeviceGraph(csr_from_scipy(self.adj, dtype=dtype),
                           {k: place(v, pad=False) for k, v in self.ndata.items()
                            if np.asarray(v).dtype.kind in "fiub"})

    def to_bsr(self, block: int = 128):
        """Block-sparse device form for the Pallas SpMM fast path.

        Suitable when layers need weighted-sum (or, with the paired degree
        vector, mean) aggregation over a static adjacency
        (GCN/WeightedGraphConv/TAG/SAGE); for scDeepSort's AdaptiveSAGE use
        :meth:`to_adaptive_bsr`."""
        from dance_tpu.ops.pallas_kernels import bsr_from_scipy
        return bsr_from_scipy(self.adj, block=block)

    def to_dense_adj(self, dtype=jnp.float32):
        """Dense device adjacency (one-MXU-matmul SpMM) for high-density
        graphs — see :class:`dance_tpu.ops.sparse.DenseAdj` and
        :func:`dance_tpu.ops.pallas_kernels.choose_adj_format`."""
        from dance_tpu.ops.sparse import dense_adj_from_scipy
        return dense_adj_from_scipy(self.adj, dtype=dtype)

    def to_adaptive_bsr(self, block: int = 128, dense: bool = False):
        """Decomposed form for AdaptiveSAGE (see
        :class:`dance_tpu.ops.sparse.AdaptiveBSR`): one SpMM over the
        off-diagonal adjacency + per-node alpha scales + self-loop terms.
        ``dense=True`` stores the off-diagonal as a dense operand (one MXU
        matmul — the winner above a few percent density); otherwise the
        Pallas block-sparse tiling. Requires the bipartite ``cell_id`` node
        labels (gene index or -1)."""
        from dance_tpu.ops.pallas_kernels import bsr_from_scipy
        from dance_tpu.ops.sparse import AdaptiveBSR, dense_adj_from_scipy
        gene_idx = np.asarray(self.ndata["cell_id"], np.int32)
        adj = self.adj.tocsr()
        w_diag = np.asarray(adj.diagonal(), np.float32)
        off = adj - sp.diags(w_diag)
        off.eliminate_zeros()
        deg = np.diff(adj.indptr).astype(np.float32)
        off_dev = (dense_adj_from_scipy(off) if dense
                   else bsr_from_scipy(off, block=block))
        return AdaptiveBSR(off_dev, jnp.asarray(w_diag), jnp.asarray(gene_idx),
                           jnp.asarray(deg), int(self.info["num_genes"]))

    def __repr__(self):
        return (f"Graph(num_nodes={self.num_nodes}, num_edges={self.num_edges}, "
                f"ndata={list(self.ndata)}, info={self.info})")


__all__ = ["DeviceGraph", "Graph"]

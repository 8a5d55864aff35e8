"""Graph neural layers over CSR adjacency (parity: dance/models/nn/gnn.py + the
DGL/PyG conv layers embedded across the model zoo).

All layers are flax modules taking ``(adj: CSRMatrix, h)``; message passing
lowers to the segment ops in :mod:`dance_tpu.ops.segment`.
"""

from typing import Any, Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from dance_tpu.ops.pallas_kernels import bsr_spmm_ad
from dance_tpu.ops.segment import (aggregate, edge_softmax, gather_src, in_degrees,
                                   out_degrees, spmm)
from dance_tpu.ops.sparse import AdaptiveBSR, CSRMatrix


class GCNConv(nn.Module):
    """Kipf-Welling GCN layer: expects a (sym-)normalized adjacency."""

    out_dim: int
    use_bias: bool = True
    activation: Optional[Callable] = None

    @nn.compact
    def __call__(self, adj: CSRMatrix, h):
        h = nn.Dense(self.out_dim, use_bias=self.use_bias,
                     kernel_init=nn.initializers.glorot_uniform())(h)
        out = spmm(adj, h)
        return self.activation(out) if self.activation else out


class WeightedGraphConv(nn.Module):
    """dgl GraphConv with edge weights (parity: graphsc.py:414).

    norm='both' scales by out-deg^-1/2 before and in-deg^-1/2 after."""

    out_dim: int
    norm: str = "both"
    use_bias: bool = True

    @nn.compact
    def __call__(self, adj: CSRMatrix, h, agg: str = "sum", degrees=None):
        if self.norm == "both":
            od = jnp.maximum(out_degrees(adj), 1.0)
            h = h * jax.lax.rsqrt(od)[:, None]
        h = nn.Dense(self.out_dim, use_bias=False,
                     kernel_init=nn.initializers.glorot_uniform())(h)
        # BSR mean aggregation needs the per-row edge counts from the builder
        out = spmm(adj, h, op=agg, degrees=degrees)
        if self.norm == "both":
            idg = jnp.maximum(in_degrees(adj), 1.0)
            out = out * jax.lax.rsqrt(idg)[:, None]
        elif self.norm == "right":
            idg = jnp.maximum(in_degrees(adj), 1.0)
            out = out / idg[:, None]
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros, (self.out_dim,))
        return out


class SAGEConv(nn.Module):
    """GraphSAGE with mean aggregation."""

    out_dim: int

    @nn.compact
    def __call__(self, adj: CSRMatrix, h):
        neigh = spmm(adj, h, op="mean")
        return (nn.Dense(self.out_dim)(h) + nn.Dense(self.out_dim, use_bias=False)(neigh))


class AdaptiveSAGE(nn.Module):
    """scDeepSort's adaptive SAGE layer (parity: models/nn/gnn.py:8-96).

    A shared vector ``alpha`` of length n_genes+2 holds per-gene interaction
    strengths (beta) plus gene/cell self-loop strengths. Each edge's message is
    ``h_src * alpha[edge_type_index] * edge_weight``, mean-aggregated, then
    dropout → Dense → activation → norm. The per-edge index follows the
    reference rules on the gene-id node labels (``cell_id`` ndata, where >=0
    marks gene nodes).
    """

    out_dim: int
    dropout: float = 0.1
    use_norm: bool = True
    # bf16 streaming for the Pallas fast path (f32 accumulation); None = f32
    bsr_dtype: Optional[Any] = None

    @staticmethod
    def edge_alpha_index(adj_rows, adj_indices, gene_id, n_genes) -> jnp.ndarray:
        """Static per-edge alpha index (parity: gnn.py:62-83).

        Depends only on graph structure — compute ONCE per graph (host-side
        numpy is fine) and pass via ``alpha_idx``; keeping it out of the traced
        graph cuts compile time substantially on large graphs."""
        import numpy as _np
        gene_id = _np.asarray(gene_id)
        src_id = gene_id[_np.asarray(adj_indices)]
        dst_id = gene_id[_np.asarray(adj_rows)]
        idx = _np.full(len(src_id), n_genes + 1, dtype=_np.int32)  # cell self
        idx = _np.where((src_id >= 0) & (dst_id < 0), src_id, idx)   # gene -> cell
        idx = _np.where((dst_id >= 0) & (src_id < 0), dst_id, idx)   # cell -> gene
        idx = _np.where((dst_id >= 0) & (src_id >= 0), n_genes, idx)  # gene self
        return idx

    @nn.compact
    def __call__(self, adj, h, gene_id, alpha, *, training: bool = False,
                 alpha_idx=None):
        n_genes = alpha.shape[0] - 2
        if isinstance(adj, AdaptiveBSR):
            # fast path: the per-edge alpha factor is a node property on the
            # bipartite graph, so the edge gather collapses into one SpMM over
            # the off-diagonal adjacency (see ops.sparse.AdaptiveBSR) — a
            # Pallas block-sparse matmul, or a plain MXU matmul when the
            # off-diagonal is stored dense (high-density graphs)
            from dance_tpu.ops.sparse import DenseAdj
            gidx = adj.gene_idx
            s = jnp.where(gidx >= 0, jnp.take(alpha, jnp.clip(gidx, 0)), 1.0)
            self_alpha = jnp.where(gidx >= 0, alpha[n_genes], alpha[n_genes + 1])
            n = h.shape[0]
            if isinstance(adj.bsr, DenseAdj):
                neigh = s[:, None] * (adj.bsr.mat @ (s[:, None] * h))
            else:
                hp = jnp.pad(s[:, None] * h,
                             ((0, adj.bsr.shape[1] - n), (0, 0)))
                neigh = s[:, None] * bsr_spmm_ad(adj.bsr, hp,
                                                 compute_dtype=self.bsr_dtype)[:n]
            z = (neigh + (adj.w_diag * self_alpha)[:, None] * h)
            z = z / jnp.maximum(adj.deg, 1.0)[:, None]
        else:
            from dance_tpu.parallel.sharded_graph import ShardedCSR, sharded_spmm
            if isinstance(adj, ShardedCSR):
                # multi-chip path: the precomputed alpha index rides the
                # sharded edge chunks; one shard_map SpMM per layer
                scale = jnp.take(alpha, adj.edge_data["alpha_idx"])
                z = sharded_spmm(adj, h, weighted=True, op="mean",
                                 edge_scale=scale)
            else:
                z = self._csr_aggregate(adj, h, gene_id, alpha, n_genes,
                                        alpha_idx)
        z = nn.Dropout(self.dropout, deterministic=not training)(z)
        z = nn.Dense(self.out_dim, kernel_init=nn.initializers.xavier_uniform())(z)
        z = nn.relu(z)
        if self.use_norm:
            z = nn.LayerNorm()(z)
        return z

    def _csr_aggregate(self, adj: CSRMatrix, h, gene_id, alpha, n_genes, alpha_idx):
        if alpha_idx is None:
            # traced fallback (small graphs / no precompute)
            src_id = jnp.take(gene_id, adj.indices)
            dst_id = jnp.take(gene_id, adj.row_ids())
            idx = jnp.full(adj.nnz, n_genes + 1, dtype=jnp.int32)
            idx = jnp.where((src_id >= 0) & (dst_id < 0), src_id, idx)
            idx = jnp.where((dst_id >= 0) & (src_id < 0), dst_id, idx)
            idx = jnp.where((dst_id >= 0) & (src_id >= 0), n_genes, idx)
        else:
            idx = alpha_idx
        msgs = gather_src(adj, h) * jnp.take(alpha, idx)[:, None] * adj.data[:, None]
        return aggregate(adj, msgs, op="mean")


class GATConv(nn.Module):
    """Graph attention conv with edge softmax (parity: STAGATE's custom GATConv)."""

    out_dim: int
    num_heads: int = 1
    negative_slope: float = 0.2
    concat: bool = True

    @nn.compact
    def __call__(self, adj, h, *, return_attention: bool = False):
        H, D = self.num_heads, self.out_dim
        feat = nn.Dense(H * D, use_bias=False,
                        kernel_init=nn.initializers.glorot_uniform())(h)
        feat = feat.reshape(-1, H, D)
        attn_l = self.param("attn_l", nn.initializers.glorot_uniform(), (1, H, D))
        attn_r = self.param("attn_r", nn.initializers.glorot_uniform(), (1, H, D))
        el = (feat * attn_l).sum(-1)  # (n, H)
        er = (feat * attn_r).sum(-1)
        from dance_tpu.ops.pallas_kernels import BSRMatrix, bsr_gat_ad
        if isinstance(adj, BSRMatrix):
            # fused Pallas path (per head): SDDMM + edge softmax + SpMM in one
            # streaming kernel; attention coefficients never hit HBM
            if return_attention:
                raise ValueError("return_attention requires the CSR adjacency")
            n = h.shape[0]
            outs = [bsr_gat_ad(adj, er[:, k], el[:, k], feat[:, k, :],
                               negative_slope=self.negative_slope)[:n]
                    for k in range(H)]
            out = jnp.stack(outs, axis=1)
            return out.reshape(-1, H * D) if self.concat else out.mean(1)
        rows = adj.row_ids()
        logits = nn.leaky_relu(jnp.take(el, adj.indices, axis=0)
                               + jnp.take(er, rows, axis=0), self.negative_slope)
        att = edge_softmax(adj, logits)  # (nnz, H)
        msgs = jnp.take(feat, adj.indices, axis=0) * att[:, :, None]
        out = aggregate(adj, msgs.reshape(adj.nnz, H * D), op="sum").reshape(-1, H, D)
        out = out.reshape(-1, H * D) if self.concat else out.mean(1)
        return (out, att) if return_attention else out


class TAGConv(nn.Module):
    """Topology-adaptive GCN: sum_k W_k (A^k X) (parity: scTAG's TAG conv)."""

    out_dim: int
    k: int = 2

    @nn.compact
    def __call__(self, adj: CSRMatrix, h):
        out = nn.Dense(self.out_dim)(h)
        hk = h
        for _ in range(self.k):
            hk = spmm(adj, hk)
            out = out + nn.Dense(self.out_dim, use_bias=False)(hk)
        return out


__all__ = ["AdaptiveSAGE", "GATConv", "GCNConv", "SAGEConv", "TAGConv",
           "WeightedGraphConv"]

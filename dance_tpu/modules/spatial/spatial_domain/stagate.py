"""STAGATE: graph-attention autoencoder for spatial domains.

Parity target: dance/modules/spatial/spatial_domain/stagate.py (custom GATConv
encoder/decoder with tied attention over the radius/kNN spatial net, MSE
reconstruction, clustering on the embedding — mclust in the paper, KMeans
here as the reference's fallback).
"""

from functools import partial
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
import scipy.sparse as sp

from dance_tpu.modules.base import BaseClusteringMethod, BasePretrain
from dance_tpu.nn.gnn import GATConv
from dance_tpu.ops.sparse import csr_from_scipy
from dance_tpu.settings import logger
from dance_tpu.transforms import AnnDataTransform, Compose, SetConfig
from dance_tpu.transforms.graph import StagateGraph
from dance_tpu.typing import LogLevel, Optional


def _edge_attention(adj, feat, attn_src, attn_dst):
    """Per-edge softmaxed attention from transformed features — STAGATE's
    custom GATConv message rule (reference stagate.py:125-127):
    ``alpha = softmax_dst(sigmoid(att_src·f[src] + att_dst·f[dst]))``."""
    from dance_tpu.ops.segment import edge_softmax
    el = (feat * attn_src).sum(-1)
    er = (feat * attn_dst).sum(-1)
    rows = adj.row_ids()
    logits = nn.sigmoid(jnp.take(el, adj.indices) + jnp.take(er, rows))
    return edge_softmax(adj, logits)


def _fused_gat(adj, feat_logits, attn_src, attn_dst, h):
    """Fused SDDMM+softmax+SpMM on the Pallas BSR kernel (sigmoid attention):
    attention logits from ``feat_logits`` (the same tied coefficients as the
    CSR path), messages from ``h``."""
    from dance_tpu.ops.pallas_kernels import bsr_gat_ad
    el = (feat_logits * attn_src).sum(-1)
    er = (feat_logits * attn_dst).sum(-1)
    n = h.shape[0]
    return bsr_gat_ad(adj, er, el, h, act="sigmoid")[:n]


def _att_aggregate(adj, feat, att):
    from dance_tpu.ops.segment import aggregate
    msgs = jnp.take(feat, adj.indices, axis=0) * att[:, None]
    return aggregate(adj, msgs, op="sum")


class _StagateNet(nn.Module):
    """GAT AE with the reference's exact tied dataflow (stagate.py:164-176):
    h1 = elu(GAT(xW1)) with sigmoid attention; z = h1·W2 WITHOUT propagation
    (conv2 runs attention=False); h3 = elu(GAT(z·W2ᵀ)) reusing LAYER-1's
    attention coefficients (tied_attention=conv1.attentions); x̂ = h3·W1ᵀ."""

    hidden_dims: Tuple[int, ...]  # (in, h, z)

    @nn.compact
    def __call__(self, adj, x):
        from dance_tpu.ops.pallas_kernels import BSRMatrix
        in_dim, h_dim, z_dim = self.hidden_dims
        w1 = self.param("w1", nn.initializers.glorot_uniform(), (in_dim, h_dim))
        w2 = self.param("w2", nn.initializers.glorot_uniform(), (h_dim, z_dim))
        a1l = self.param("a1l", nn.initializers.glorot_uniform(), (1, h_dim))
        a1r = self.param("a1r", nn.initializers.glorot_uniform(), (1, h_dim))
        f1 = x @ w1
        if isinstance(adj, BSRMatrix):
            # Pallas fast path: attention never materializes per edge; each
            # aggregation is one fused streaming kernel over the BSR tiles
            h1 = nn.elu(_fused_gat(adj, f1, a1l, a1r, f1))
            z = h1 @ w2
            h3 = nn.elu(_fused_gat(adj, f1, a1l, a1r, z @ w2.T))
            x_hat = h3 @ w1.T
            return z, x_hat
        att1 = _edge_attention(adj, f1, a1l, a1r)
        h1 = nn.elu(_att_aggregate(adj, f1, att1))
        z = h1 @ w2
        h3 = nn.elu(_att_aggregate(adj, z @ w2.T, att1))
        x_hat = h3 @ w1.T
        return z, x_hat


class Stagate(BasePretrain, BaseClusteringMethod):
    """STAGATE model (parity: stagate.py:131)."""

    _DISPLAY_ATTRS = ("hidden_dims",)

    def __init__(self, hidden_dims: Tuple[int, ...] = (3000, 512, 30),
                 device: str = "auto", pretrain_path: Optional[str] = None,
                 seed: int = 0):
        self.hidden_dims = tuple(hidden_dims)
        self.pretrain_path = pretrain_path
        self.seed = seed
        self.net = _StagateNet(hidden_dims=self.hidden_dims)
        self.params = None

    @staticmethod
    def preprocessing_pipeline(n_top_genes: int = 3000, model_name: str = "radius",
                               radius: float = 150, n_neighbors: int = 5,
                               log_level: LogLevel = "INFO"):
        return Compose(
            AnnDataTransform("sc.pp.highly_variable_genes", flavor="seurat_v3",
                             n_top_genes=n_top_genes, subset=True),
            AnnDataTransform("sc.pp.normalize_total", target_sum=1e4),
            AnnDataTransform("sc.pp.log1p"),
            StagateGraph(model_name, radius=radius, n_neighbors=n_neighbors),
            SetConfig({"feature_channel": [None, "StagateGraph"],
                       "feature_channel_type": ["X", "obsp"],
                       "label_channel": "label", "label_channel_type": "obs"}),
            log_level=log_level,
        )

    @partial(jax.jit, static_argnames=("self",))
    def _step(self, params, opt_state, adj, x):
        def loss_fn(params):
            _, x_hat = self.net.apply({"params": params}, adj, x)
            return jnp.mean((x - x_hat) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = self._tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def fit(self, inputs, y=None, *, epochs: int = 500, lr: float = 1e-3,
            gradient_clipping: float = 5.0, weight_decay: float = 1e-4,
            n_clusters: int = 7, use_bsr="auto", bsr_block: int = 128):
        """``use_bsr=True`` routes every attention aggregation through the
        fused Pallas GAT kernel (SDDMM + edge softmax + SpMM in one pass),
        after an RCM reordering that bands the spatial graph into dense tiles
        (measured 8k spots / 65k edges / 512-d on v5e: 2.6 ms/step fused+RCM
        vs 35 ms/step on the CSR segment path — ~14×; without reordering the
        random spot order touches every tile and the CSR path wins). The
        default ``"auto"`` engages it on TPU exactly when the banded tiling
        is dense enough to win (ops.pallas_kernels.resolve_use_bsr)."""
        from dance_tpu.ops.pallas_kernels import resolve_use_bsr
        x, adj = inputs
        x = np.asarray(x, dtype=np.float32)
        adj = sp.csr_matrix(adj) + sp.eye(adj.shape[0], format="csr", dtype=np.float32)
        use_bsr = resolve_use_bsr(use_bsr, adj, bsr_block)
        self._perm = None
        if use_bsr:
            from dance_tpu.ops.pallas_kernels import bsr_from_scipy, rcm_reorder
            perm, adj = rcm_reorder(adj)
            x = x[perm]
            self._perm = np.asarray(perm)
            self.adj = bsr_from_scipy(adj, block=bsr_block)
        else:
            self.adj = csr_from_scipy(adj)
        self.n_clusters = n_clusters
        xj = jnp.asarray(x)
        if self.params is None:
            self.params = self.net.init(jax.random.key(self.seed), self.adj,
                                        xj)["params"]
        self._tx = optax.chain(optax.clip_by_global_norm(gradient_clipping),
                               optax.adamw(lr, weight_decay=weight_decay))
        opt_state = self._tx.init(self.params)
        for epoch in range(epochs):
            self.params, opt_state, loss = self._step(self.params, opt_state, self.adj,
                                                      xj)
            if epoch % 100 == 0:
                logger.info("STAGATE epoch %d, MSE %.6f", epoch, float(loss))
        z, _ = self.net.apply({"params": self.params}, self.adj, xj)
        z = np.asarray(z)
        if self._perm is not None:  # undo the RCM ordering for callers
            z_orig = np.empty_like(z)
            z_orig[self._perm] = z
            z = z_orig
        self.z = z
        return self

    def predict(self, x=None):
        from dance_tpu.ops.cluster import kmeans
        return np.asarray(kmeans(self.z, self.n_clusters, n_init=10,
                                 seed=self.seed).labels)

    def get_latent(self):
        return self.z

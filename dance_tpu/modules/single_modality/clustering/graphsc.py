"""graph-sc: graph-conv autoencoder on the cell-gene graph + KMeans/Leiden.

Parity target: dance/modules/single_modality/clustering/graphsc.py (GCNAE with
WeightedGraphConv encoder, inner-product adjacency decoder trained with
pos-weighted BCE, clustering on cell embeddings). Full-graph jitted training
replaces the DGL neighbor-sampling loader — the whole graph fits on chip, so
sampling is pure overhead on TPU.
"""

from functools import partial
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from dance_tpu.modules.base import BaseClusteringMethod
from dance_tpu.nn.gnn import WeightedGraphConv
from dance_tpu.ops.sparse import CSRMatrix
from dance_tpu.utils.loss import binary_ce_logits
from dance_tpu.settings import logger
from dance_tpu.transforms import AnnDataTransform, Compose, SetConfig
from dance_tpu.transforms.graph import PCACellFeatureGraph
from dance_tpu.typing import Any, Literal, LogLevel


class GCNAE(nn.Module):
    """Graph conv encoder + inner-product decoder (parity: graphsc.py:274)."""

    agg: str = "sum"
    hidden_dim: int = 200
    hidden_1: int = 300
    hidden_2: int = 0
    dropout: float = 0.1
    n_layers: int = 1

    @nn.compact
    def __call__(self, adj: CSRMatrix, feats, *, training: bool = False,
                 degrees=None):
        h = nn.Dropout(self.dropout, deterministic=not training)(feats)
        h = WeightedGraphConv(self.hidden_dim, norm="none")(adj, h, agg=self.agg,
                                                            degrees=degrees)
        h = nn.relu(h)
        for _ in range(self.n_layers - 1):
            h = WeightedGraphConv(self.hidden_dim, norm="none")(adj, h, agg=self.agg,
                                                                degrees=degrees)
            h = nn.relu(h)
        if self.hidden_1:
            h = nn.Dense(self.hidden_1)(h)
        if self.hidden_2:
            h = nn.relu(h)
            h = nn.Dense(self.hidden_2)(h)
        emb = h
        adj_logits = nn.sigmoid(emb @ emb.T)
        return adj_logits, emb


class GraphSC(BaseClusteringMethod):
    """graph-sc model (parity: graphsc.py:34)."""

    def __init__(self, agg: str = "sum", activation: str = "relu", in_feats: int = 50,
                 n_hidden: int = 1, hidden_dim: int = 200, hidden_1: int = 300,
                 hidden_2: int = 0, dropout: float = 0.1, n_layers: int = 1,
                 hidden_relu: bool = False, hidden_bn: bool = False,
                 n_clusters: int = 10,
                 cluster_method: Literal["kmeans", "leiden"] = "kmeans",
                 num_workers: int = 1, device: str = "auto", seed: int = 0):
        self.n_layers = n_layers
        self.n_clusters = n_clusters
        self.cluster_method = cluster_method
        self.seed = seed
        self.model = GCNAE(agg=agg, hidden_dim=hidden_dim, hidden_1=hidden_1,
                           hidden_2=hidden_2, dropout=dropout, n_layers=n_layers)
        self.params = None
        self.z = None

    @staticmethod
    def preprocessing_pipeline(n_top_genes: int = 3000,
                               normalize_weights: str = "log_per_cell",
                               n_components: int = 50, normalize_edges: bool = False,
                               log_level: LogLevel = "INFO"):
        transforms = [
            AnnDataTransform("sc.pp.filter_genes", min_counts=3),
            AnnDataTransform("sc.pp.filter_cells", min_counts=1),
            AnnDataTransform("sc.pp.normalize_total"),
            AnnDataTransform("sc.pp.log1p"),
            AnnDataTransform("sc.pp.highly_variable_genes", min_mean=0.0125, max_mean=4,
                             flavor="cell_ranger", min_disp=0.5,
                             n_top_genes=n_top_genes, subset=True),
        ]
        if normalize_weights == "log_per_cell":
            transforms.extend([AnnDataTransform("sc.pp.log1p"),
                               AnnDataTransform("sc.pp.normalize_total", target_sum=1)])
        elif normalize_weights == "per_cell":
            transforms.append(AnnDataTransform("sc.pp.normalize_total", target_sum=1))
        elif normalize_weights != "none":
            raise ValueError(f"Unknown normalization option {normalize_weights!r}")
        transforms.extend([
            PCACellFeatureGraph(n_components=n_components,
                                normalize_edges=normalize_edges,
                                feat_norm_mode="standardize",
                                out="CellFeatureGraph"),
            SetConfig({"feature_channel": "CellFeatureGraph",
                       "feature_channel_type": "uns", "label_channel": "Group"}),
        ])
        return Compose(*transforms, log_level=log_level)

    @partial(jax.jit, static_argnames=("self",))
    def _train_step(self, params, opt_state, adj, feats, adj_target, cell_slice, key,
                    degrees=None):
        def loss_fn(params):
            _, emb = self.model.apply({"params": params}, adj, feats,
                                      training=True, rngs={"dropout": key},
                                      degrees=degrees)
            # slice BEFORE the Gram matmul (cells² ≪ (cells+genes)²) and take
            # the BCE from raw logits — the model's full sigmoid adjacency
            # output is unused here and pruned by XLA
            cell_emb = emb[cell_slice]
            cell_logits = cell_emb @ cell_emb.T
            pos = adj_target.sum()
            total = adj_target.shape[0] ** 2
            pos_weight = (total - pos) / jnp.maximum(pos, 1.0)
            norm = total / jnp.maximum((total - pos) * 2, 1.0)
            bce = binary_ce_logits(cell_logits, adj_target,
                                   pos_weight=pos_weight)
            return norm * bce

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = self._tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @partial(jax.jit, static_argnames=("self",))
    def _embed(self, params, adj, feats, degrees=None):
        return self.model.apply({"params": params}, adj, feats,
                                degrees=degrees)[1]

    def fit(self, g, y: Optional[Any] = None, *, epochs: int = 100, lr: float = 1e-5,
            batch_size: int = 128, show_epoch_ari: bool = False,
            eval_epoch: bool = False, use_bsr="auto", bsr_block: int = 128):
        """Train on a Graph built by CellFeatureBipartiteGraph.

        ``use_bsr=True`` runs message passing through the Pallas block-sparse
        SpMM (sum or mean aggregation) — faster on chip for banded/bipartite
        adjacencies; differentiable via :func:`bsr_spmm_ad`. ``"auto"``
        (default) engages it on TPU when the natural-order tiling is dense
        enough to win and the aggregation supports it."""
        from dance_tpu.graph import Graph
        assert isinstance(g, Graph), f"expected dance_tpu Graph, got {type(g)}"
        fmt = {True: "bsr", False: "csr"}.get(use_bsr)
        if use_bsr == "auto":
            if self.model.agg not in ("sum", "mean"):
                # max aggregation takes the XLA segment-max path by design:
                # max-of-products has no MXU formulation, so a Pallas tile op
                # would run on the VPU with no advantage over segment-max
                # (measured note in BENCH_NOTES.md §BSR-max)
                logger.info("agg=%r: Pallas BSR path not applicable; using "
                            "the XLA segment-max path", self.model.agg)
                fmt = "csr"
            else:
                from dance_tpu.ops.pallas_kernels import choose_adj_format
                fmt = choose_adj_format(g.adj, bsr_block, reorder=False)
                logger.info("use_bsr='auto' resolved to the %s adjacency", fmt)
        n_genes = g.info["num_genes"]
        n_cells = g.info["num_cells"]
        # device inputs are cached across fits on the same graph: the dense
        # adjacency + BCE target total ~1 GB at 12k nodes, and re-uploading
        # them over the relay every fit costs 10-100x the training itself
        # (repeat fits on one graph are the norm in sweeps/benchmarks)
        cache_key = (id(g), g.adj.shape, g.adj.nnz, fmt, bsr_block)
        if getattr(self, "_fit_cache_key", None) == cache_key:
            conv_adj, feats, adj_target, self._degrees = self._fit_cache
        else:
            dg = g.to_device()
            conv_adj = dg.adj
            self._degrees = None
            if fmt == "dense":
                conv_adj = g.to_dense_adj()
            elif fmt == "bsr":
                if self.model.agg not in ("sum", "mean"):
                    raise ValueError("use_bsr supports agg='sum' or 'mean'")
                conv_adj = g.to_bsr(block=bsr_block)
                if self.model.agg == "mean":
                    import numpy as _np
                    self._degrees = jnp.asarray(
                        _np.diff(g.adj.indptr).astype(_np.float32))
            else:
                from dance_tpu.parallel.mesh import active_dp_mesh
                dp_mesh = active_dp_mesh()
                if dp_mesh is not None and dp_mesh.shape["dp"] > 1:
                    # multi-chip fit: block-row-sharded adjacency — per-device
                    # edge storage ~1/D; WeightedGraphConv's spmm dispatches to
                    # the shard_map path (true in-degrees carried for agg='mean')
                    from dance_tpu.parallel.sharded_graph import shard_csr
                    conv_adj = shard_csr(g.adj, dp_mesh)
            feats = dg.ndata.get("features")
            if feats is None:
                # fall back to adjacency rows against gene nodes as features
                feats = jnp.asarray(
                    np.asarray(g.adj[:, :n_genes].todense()), jnp.float32)
            # reconstruction target: full (bipartite) adjacency as in the
            # reference, where the sampled block adjacency spans both node types
            adj_target = jnp.asarray(
                np.asarray((g.adj > 0).todense(), dtype=np.float32))
            self._fit_cache_key = cache_key
            self._fit_cache = (conv_adj, feats, adj_target, self._degrees)
        cell_slice = jnp.arange(g.num_nodes)

        key = jax.random.key(self.seed)
        if self.params is None:
            self.params = self.model.init({"params": key, "dropout": key}, conv_adj,
                                          feats, degrees=self._degrees)["params"]
        self._tx = optax.adam(lr)
        opt_state = self._tx.init(self.params)

        aris, zs = [], []
        if eval_epoch and y is not None:
            y_arr = np.asarray(y).ravel()
            n_true = int(y_arr.max()) + 1
            y_dev = jnp.asarray(y_arr, jnp.int32)
        for epoch in range(epochs):
            key, sk = jax.random.split(key)
            self.params, opt_state, loss = self._train_step(
                self.params, opt_state, conv_adj, feats, adj_target, cell_slice, sk,
                self._degrees)
            if eval_epoch or epoch == epochs - 1:
                emb = self._embed(self.params, conv_adj, feats, self._degrees)
                z_dev = emb[n_genes:]
                if eval_epoch and y is not None:
                    if self.cluster_method == "kmeans":
                        # device ARI over the device kmeans labels: only the
                        # scalar crosses the relay per epoch (pulling z +
                        # host sklearn per epoch dominated the epoch cost)
                        from dance_tpu.ops.cluster import kmeans
                        from dance_tpu.utils.metrics import device_ari
                        labels = kmeans(z_dev, self.n_clusters, n_init=10,
                                        seed=5).labels
                        score = float(device_ari(y_dev, labels, n_true,
                                                 self.n_clusters))
                    else:
                        self.z = np.asarray(z_dev)
                        score = self.score(None, y)
                    aris.append(score)
                    zs.append(z_dev)
                    if show_epoch_ari:
                        logger.info("epoch %4d, ARI %.4f", epoch, score)
        self.z = np.asarray(zs[int(np.argmax(aris))] if aris else z_dev)
        return self

    def predict(self, x: Optional[Any] = None):
        if self.cluster_method == "kmeans":
            from dance_tpu.ops.cluster import kmeans
            return np.asarray(kmeans(self.z, self.n_clusters, n_init=10, seed=5).labels)
        if self.cluster_method == "leiden":
            from dance_tpu.ops.cluster import leiden
            from dance_tpu.ops.neighbors import knn_graph
            adj = knn_graph(self.z, 15, mode="connectivity", include_self=False)
            return leiden(adj, seed=self.seed)
        raise ValueError(f"Unknown clustering {self.cluster_method!r}")

    def get_latent(self):
        return self.z


def run_leiden(embeddings, n_neighbors: int = 15, resolution: float = 1.0,
               seed: int = 0) -> np.ndarray:
    """Leiden labels from an embedding's kNN graph (parity: graphsc.py
    run_leiden; first-party Leiden replaces the leidenalg dependency)."""
    from dance_tpu.ops.cluster import leiden
    from dance_tpu.ops.neighbors import knn_graph
    emb = np.asarray(embeddings, np.float32)
    adj = knn_graph(emb, min(n_neighbors, len(emb) - 1))
    return np.asarray(leiden(adj, resolution=resolution, seed=seed))


class InnerProductDecoder(nn.Module):
    """sigmoid(Z Zᵀ) adjacency decoder (parity: graphsc.py InnerProductDecoder)."""

    @nn.compact
    def __call__(self, z):
        return nn.sigmoid(z @ z.T)


# reference name for the gene-indexed learned-alpha conv
# (graphsc.py WeightedGraphConvAlpha == the AdaptiveSAGE message rule)
from dance_tpu.nn.gnn import AdaptiveSAGE as WeightedGraphConvAlpha  # noqa: E402,F401

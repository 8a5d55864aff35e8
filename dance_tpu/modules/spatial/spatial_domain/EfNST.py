"""EfNST: CNN image features + graph autoencoder + DEC for spatial domains.

Parity target: dance/modules/spatial/spatial_domain/EfNST.py (1160 LoC:
EfficientNet tile features concatenated with expression PCA, a GCN variational
autoencoder with inner-product adjacency decoder and gradient-reversal domain
head, DEC refinement, and a spatial label refiner). Compact rebuild: the image
features come from :class:`~dance_tpu.transforms.MorphologyFeatureCNN` (random
conv features — no pretrained EfficientNet offline), the graph VAE + DEC run
jitted, and :class:`Refiner` applies the same neighborhood majority smoothing.
"""

from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
import scipy.sparse as sp

from dance_tpu.modules.base import BaseClusteringMethod
from dance_tpu.ops.segment import spmm
from dance_tpu.ops.sparse import CSRMatrix, csr_from_scipy
from dance_tpu.settings import logger
from dance_tpu.transforms import (AnnDataTransform, CellPCA, Compose,
                                  MorphologyFeatureCNN, SetConfig)
from dance_tpu.transforms.graph import StagateGraph
from dance_tpu.typing import LogLevel, Optional
from dance_tpu.utils.loss import cluster_kl_loss, soft_assign, target_distribution
from dance_tpu.utils.wrappers import as_numpy


class Refiner:
    """Neighborhood majority-vote label smoothing (parity: EfNST.py:380)."""

    def __init__(self, shape: str = "hexagon"):
        self.shape = shape

    def fit(self, sample_id, pred, dis):
        dis = np.asarray(dis)
        pred = np.asarray(pred)
        k = 6 if self.shape == "hexagon" else 4
        refined = pred.copy()
        for i in range(len(pred)):
            nbrs = np.argsort(dis[i])[1:k + 1]
            votes = np.bincount(pred[nbrs], minlength=pred.max() + 1)
            if votes.max() > k / 2 and votes.argmax() != pred[i]:
                refined[i] = votes.argmax()
        return refined


class _EfNSTNet(nn.Module):
    z_dim: int = 32

    @nn.compact
    def __call__(self, adj: CSRMatrix, x):
        h = nn.relu(spmm(adj, nn.Dense(128)(x)))
        z = spmm(adj, nn.Dense(self.z_dim)(h))
        adj_logits = nn.sigmoid(z @ z.T)
        x_hat = nn.Dense(x.shape[-1])(nn.relu(nn.Dense(128)(z)))
        return z, adj_logits, x_hat


class EfNsSTRunner(BaseClusteringMethod):
    """EfNST runner (parity: EfNST.py:1007)."""

    _DISPLAY_ATTRS = ("n_clusters", "z_dim")

    def __init__(self, n_clusters: int = 7, z_dim: int = 32, pretrain: bool = True,
                 seed: int = 0, **kwargs):
        self.n_clusters = n_clusters
        self.z_dim = z_dim
        self.seed = seed
        self.net = _EfNSTNet(z_dim=z_dim)
        self.params = None

    @staticmethod
    def preprocessing_pipeline(data_name: str = "", verbose: bool = False,
                               cnnType: str = "efficientnet-b0",
                               pca_n_comps: int = 200, distType: str = "KDTree",
                               k: int = 12, dim_reduction: bool = True,
                               min_cells: int = 3, platform: str = "Visium",
                               log_level: LogLevel = "INFO"):
        return Compose(
            AnnDataTransform("sc.pp.filter_genes", min_cells=min_cells),
            AnnDataTransform("sc.pp.normalize_total", target_sum=1e4),
            AnnDataTransform("sc.pp.log1p"),
            MorphologyFeatureCNN(n_components=min(pca_n_comps, 50)),
            CellPCA(n_components=min(pca_n_comps, 50)),
            StagateGraph("knn", n_neighbors=k),
            SetConfig({"feature_channel": ["CellPCA", "MorphologyFeatureCNN",
                                           "StagateGraph"],
                       "feature_channel_type": ["obsm", "obsm", "obsp"],
                       "label_channel": "label", "label_channel_type": "obs"}),
            log_level=log_level,
        )

    @partial(jax.jit, static_argnames=("self", "use_dec"))
    def _step(self, theta, opt_state, adj, x, adj_target, p, use_dec: bool):
        def loss_fn(theta):
            params, mu = theta
            z, adj_logits, x_hat = self.net.apply({"params": params}, adj, x)
            eps = 1e-7
            a_loss = -(adj_target * jnp.log(adj_logits + eps)
                       + (1 - adj_target) * jnp.log(1 - adj_logits + eps)).mean()
            r_loss = jnp.mean((x - x_hat) ** 2)
            loss = a_loss + r_loss
            if use_dec:
                q = soft_assign(z, mu, 1.0)
                loss = loss + cluster_kl_loss(p, q)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(theta)
        updates, opt_state = self._tx.update(grads, opt_state, theta)
        return optax.apply_updates(theta, updates), opt_state, loss

    def fit(self, adata=None, concat_X=None, graph_dict=None, domains=None,
            pretrain: bool = True, epochs: int = 200, dec_epochs: int = 100,
            lr: float = 1e-3):
        from dance_tpu.ops.cluster import kmeans
        x = jnp.asarray(as_numpy(concat_X), jnp.float32)
        adj_raw = sp.csr_matrix(graph_dict)
        adj_raw = ((adj_raw + adj_raw.T) > 0).astype(np.float32)
        n = adj_raw.shape[0]
        adj_n = adj_raw + sp.eye(n, format="csr", dtype=np.float32)
        deg = np.asarray(adj_n.sum(1)).ravel()
        dinv = 1.0 / np.sqrt(np.maximum(deg, 1e-12))
        adj = csr_from_scipy(sp.diags(dinv) @ adj_n @ sp.diags(dinv))
        adj_target = jnp.asarray(adj_raw.todense())

        key = jax.random.key(self.seed)
        params = self.net.init(key, adj, x)["params"]
        mu = jnp.zeros((self.n_clusters, self.z_dim), jnp.float32)
        self._tx = optax.adam(lr)
        theta = (params, mu)
        opt_state = self._tx.init(theta)
        p = jnp.zeros((n, self.n_clusters), jnp.float32)
        for epoch in range(epochs):
            theta, opt_state, loss = self._step(theta, opt_state, adj, x, adj_target, p,
                                                False)
        params, _ = theta
        z, _, _ = self.net.apply({"params": params}, adj, x)
        res = kmeans(z, self.n_clusters, n_init=10, seed=self.seed)
        theta = (params, jnp.asarray(res.centers))
        opt_state = self._tx.init(theta)
        for epoch in range(dec_epochs):
            params, mu = theta
            z, _, _ = self.net.apply({"params": params}, adj, x)
            q = soft_assign(z, mu, 1.0)
            p = target_distribution(q)
            theta, opt_state, loss = self._step(theta, opt_state, adj, x, adj_target, p,
                                                True)
        self._theta = theta
        self._cache = (adj, x)
        params, mu = theta
        z, _, _ = self.net.apply({"params": params}, adj, x)
        self.q = np.asarray(soft_assign(z, mu, 1.0))
        self.z = np.asarray(z)
        return self

    def predict(self, x=None):
        return self.q.argmax(1)

    def get_latent(self):
        return self.z


# reference export name
EfNST = EfNsSTRunner

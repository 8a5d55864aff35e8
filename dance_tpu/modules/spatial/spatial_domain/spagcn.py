"""SpaGCN: histology-aware graph convolution + DEC for spatial domains.

Parity target: dance/modules/spatial/spatial_domain/spagcn.py (SimpleGCDEC —
one GraphConvolution over exp(-d²/2l²) affinities with DEC refinement,
louvain/kmeans initialization, and the l/resolution search utilities).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dance_tpu.modules.base import BaseClusteringMethod
from dance_tpu.settings import logger
from dance_tpu.transforms import (AnnDataTransform, CellPCA, Compose, FilterGenesMatch,
                                  SetConfig)
from dance_tpu.transforms.graph import SpaGCNGraph, SpaGCNGraph2D
from dance_tpu.typing import LogLevel, Optional
from dance_tpu.utils.loss import cluster_kl_loss, target_distribution
from dance_tpu.utils.wrappers import as_numpy


def _soft_assign(z, mu, alpha: float = 0.2):
    """Reference SimpleGCDEC's q (spagcn.py:391-397): Student-t kernel with
    alpha=0.2 raised to (alpha+1) — the reference's trailing ``/2.0`` is a
    constant that cancels under row normalization, so the effective exponent
    is (alpha+1), not standard DEC's (alpha+1)/2."""
    d2 = jnp.sum((z[:, None, :] - mu[None, :, :]) ** 2, axis=-1)
    q = (1.0 / (1.0 + d2 / alpha + 1e-8)) ** (alpha + 1.0)
    return q / jnp.sum(q, axis=1, keepdims=True)


def search_l(p: float, adj: np.ndarray, start: float = 0.01, end: float = 1000,
             tol: float = 0.01, max_run: int = 100) -> float:
    """Bisection for the length scale l whose affinity mass matches p
    (parity: spagcn.py util search_l)."""

    def p_of(l):
        a = np.exp(-(adj ** 2) / (2 * l ** 2))
        return float(a.sum(1).mean() - 1)

    lo, hi = start, end
    for _ in range(max_run):
        mid = (lo + hi) / 2
        pm = p_of(mid)
        if abs(pm - p) < tol:
            return mid
        if pm > p:
            hi = mid
        else:
            lo = mid
    logger.warning("search_l did not converge; returning midpoint")
    return (lo + hi) / 2


class SpaGCN(BaseClusteringMethod):
    """SpaGCN model (parity: spagcn.py:700)."""

    _DISPLAY_ATTRS = ("l",)

    def __init__(self, l: Optional[float] = None, device: str = "auto", seed: int = 0,
                 alpha: float = 0.2):
        self.l = l
        self.alpha = alpha
        self.res = None
        self.seed = seed

    @staticmethod
    def preprocessing_pipeline(alpha: float = 1, beta: int = 49, dim: int = 50,
                               log_level: LogLevel = "INFO"):
        return Compose(
            FilterGenesMatch(prefixes=["ERCC", "MT-"]),
            AnnDataTransform("sc.pp.normalize_total", target_sum=1e4),
            AnnDataTransform("sc.pp.log1p"),
            SpaGCNGraph(alpha=alpha, beta=beta),
            SpaGCNGraph2D(),
            CellPCA(n_components=dim),
            SetConfig({"feature_channel": ["CellPCA", "SpaGCNGraph", "SpaGCNGraph2D"],
                       "feature_channel_type": ["obsm", "obsp", "obsp"],
                       "label_channel": "label", "label_channel_type": "obs"}),
            log_level=log_level,
        )

    def search_l(self, p, adj, start=0.01, end=1000, tol=0.01, max_run=100):
        return search_l(p, np.asarray(adj), start, end, tol, max_run)

    def set_l(self, l):
        self.l = l

    def calc_adj_exp(self, adj: np.ndarray) -> np.ndarray:
        return np.exp(-(np.asarray(adj) ** 2) / (2 * self.l ** 2))

    # --- training ---------------------------------------------------------

    @partial(jax.jit, static_argnames=("self",))
    def _step(self, theta, opt_state, a_norm, x, p):
        def loss_fn(theta):
            w, mu = theta
            z = a_norm @ (x @ w)
            q = _soft_assign(z, mu, self.alpha)
            return cluster_kl_loss(p, q)

        loss, grads = jax.value_and_grad(loss_fn)(theta)
        updates, opt_state = self._tx.update(grads, opt_state, theta)
        return optax.apply_updates(theta, updates), opt_state, loss

    def fit(self, x, y=None, *, num_pcs: int = 50, lr: float = 0.005,
            epochs: int = 2000, weight_decay: float = 0, opt: str = "admin",
            init_spa: bool = True, init: str = "louvain", n_neighbors: int = 10,
            n_clusters: Optional[int] = None, res: float = 0.4, tol: float = 1e-3):
        embed, adj = x
        if self.l is None:
            raise ValueError("l must be set before fitting (use search_l/set_l)")
        embed = as_numpy(embed).astype(np.float32)
        a = self.calc_adj_exp(adj)
        a_norm = jnp.asarray(a / a.sum(1, keepdims=True), jnp.float32)
        xj = jnp.asarray(embed)

        w0 = jnp.eye(embed.shape[1], dtype=jnp.float32)
        z0 = np.asarray(a_norm @ (xj @ w0))

        # initialize cluster assignment
        if init == "louvain":
            from dance_tpu.ops.cluster import louvain
            from dance_tpu.ops.neighbors import knn_graph
            g = knn_graph(z0, min(n_neighbors, len(z0) - 1), mode="connectivity",
                          include_self=False)
            y0 = louvain(g, resolution=res, seed=self.seed)
        else:
            from dance_tpu.ops.cluster import kmeans
            y0 = np.asarray(kmeans(z0, n_clusters or 10, seed=self.seed).labels)
        k = int(y0.max()) + 1
        mu0 = np.stack([z0[y0 == c].mean(0) if (y0 == c).any() else z0.mean(0)
                        for c in range(k)])

        theta = (w0, jnp.asarray(mu0, jnp.float32))
        self._tx = optax.adam(lr)
        opt_state = self._tx.init(theta)
        y_last = y0
        for epoch in range(epochs):
            if epoch % 3 == 0:
                w, mu = theta
                z = a_norm @ (xj @ w)
                q = _soft_assign(z, mu, self.alpha)
                p = target_distribution(q)
                y_now = np.asarray(q.argmax(1))
                delta = (y_now != y_last).mean()
                y_last = y_now
                if epoch > 0 and delta < tol:
                    break
            theta, opt_state, loss = self._step(theta, opt_state, a_norm, xj, p)
        self._theta = theta
        self._a_norm = a_norm
        return self

    def predict_proba(self, x):
        embed, adj = x
        a = self.calc_adj_exp(adj)
        a_norm = jnp.asarray(a / a.sum(1, keepdims=True), jnp.float32)
        w, mu = self._theta
        z = a_norm @ (jnp.asarray(as_numpy(embed), jnp.float32) @ w)
        return np.asarray(_soft_assign(z, mu, self.alpha))

    def predict(self, x):
        return self.predict_proba(x).argmax(1)

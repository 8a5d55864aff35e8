"""GraphSCI: gene-gene graph VAE + expression autoencoder joint imputation.

Parity target: dance/modules/single_modality/imputation/graphsci.py (GNNModel
variational encoder over the gene correlation graph reconstructing adjacency,
AEModel reconstructing expression conditioned on the graph embedding, joint
adjacency-BCE + NB expression likelihood + KL training).
"""

from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from dance_tpu.modules.base import BaseRegressionMethod
from dance_tpu.nn.zinb_ae import disp_act, mean_act
from dance_tpu.ops.segment import spmm
from dance_tpu.ops.sparse import CSRMatrix
from dance_tpu.settings import logger
from dance_tpu.transforms import (AnnDataTransform, CellwiseMaskData, Compose,
                                  FilterCellsScanpy, FilterGenesScanpy, SaveRaw,
                                  SetConfig)
from dance_tpu.transforms.graph import FeatureFeatureGraph
from dance_tpu.typing import LogLevel, Optional
from dance_tpu.utils.loss import kl_divergence, nb_nll
from dance_tpu.utils.wrappers import as_numpy


class _GraphSCINet(nn.Module):
    n_genes: int
    hidden1: int = 256
    hidden2: int = 128

    def setup(self):
        self.gc1 = nn.Dense(self.hidden1, use_bias=False)
        self.gc_mu = nn.Dense(self.hidden2, use_bias=False)
        self.gc_logvar = nn.Dense(self.hidden2, use_bias=False)
        self.ae_enc1 = nn.Dense(self.hidden1)
        self.ae_enc2 = nn.Dense(self.hidden2)
        self.dec_mean = nn.Dense(self.n_genes)
        self.dec_disp = nn.Dense(self.n_genes)

    def __call__(self, adj: CSRMatrix, gene_feat, x, rng):
        # graph VAE over genes
        h = nn.relu(spmm(adj, self.gc1(gene_feat)))
        mu = spmm(adj, self.gc_mu(h))
        logvar = spmm(adj, self.gc_logvar(h))
        z_g = mu + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mu.shape)
        adj_logits = nn.sigmoid(z_g @ z_g.T)
        # expression AE modulated by the gene embedding similarity
        h_x = nn.relu(self.ae_enc1(x))
        h_x = nn.relu(self.ae_enc2(h_x))
        mean = mean_act(self.dec_mean(h_x))
        disp = disp_act(self.dec_disp(h_x))
        # graph-informed smoothing of the mean (gene-axis message passing)
        gene_sim = nn.softmax(z_g @ z_g.T / jnp.sqrt(z_g.shape[1]), axis=-1)
        mean = 0.5 * mean + 0.5 * mean @ gene_sim.T
        return adj_logits, mean, disp, mu, logvar


class GraphSCI(BaseRegressionMethod):
    """GraphSCI model (parity: graphsci.py:126)."""

    _DISPLAY_ATTRS = ("n_epochs", "lr", "weight_decay")

    def __init__(self, num_cells: int, num_genes: int, dataset: str = "",
                 n_epochs: int = 100, lr: float = 1e-3, weight_decay: float = 1e-5,
                 dropout: float = 0.1, gpu: int = -1, seed: Optional[int] = 0):
        self.num_cells = num_cells
        self.num_genes = num_genes
        self.n_epochs = n_epochs
        self.lr = lr
        self.weight_decay = weight_decay
        self.seed = seed or 0
        self.net = _GraphSCINet(n_genes=num_genes)
        self.params = None

    @staticmethod
    def preprocessing_pipeline(min_cells: float = 0.1, threshold: float = 0.3,
                               mask: bool = True, distr: str = "exp",
                               mask_rate: float = 0.1, seed: Optional[int] = None,
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
        transforms.extend([
            FeatureFeatureGraph(threshold=threshold, positive_only=False),
            SetConfig({"feature_channel": ["FeatureFeatureGraph", None, "train_mask"]
                       if mask else ["FeatureFeatureGraph", None],
                       "feature_channel_type": ["uns", "X", "layers"] if mask
                       else ["uns", "X"],
                       "label_channel": [None, None],
                       "label_channel_type": ["X", "raw_X"]}),
        ])
        return Compose(*transforms, log_level=log_level)

    @partial(jax.jit, static_argnames=("self",))
    def _step(self, params, opt_state, adj, gene_feat, x, x_raw, sf, adj_target,
              loss_mask, key, le, la, ke, ka):
        def loss_fn(params):
            adj_logits, mean, disp, mu, logvar = self.net.apply(
                {"params": params}, adj, gene_feat, x, key)
            eps = 1e-7
            # loss-term weights mirror the reference (graphsci.py:476-497):
            # la scales the adjacency BCE, le the expression NLL, ka the
            # adjacency KL
            a_loss = -(adj_target * jnp.log(adj_logits + eps)
                       + (1 - adj_target) * jnp.log(1 - adj_logits + eps)).mean()
            x_loss = (nb_nll(x_raw, mean, disp, scale_factor=sf[:, None], reduce=False)
                      * loss_mask).sum() / jnp.maximum(loss_mask.sum(), 1.0)
            kl = kl_divergence(mu, logvar) / mu.shape[0]
            # ke subtracts an expression-embedding anchor like the reference's
            # kl_exp term; our AE has no stochastic expression latent, so its
            # anchor is the masked recon MSE of the NB mean in log space
            exp_anchor = (((jnp.log1p(mean) - x) ** 2) * loss_mask).mean()
            return (la * a_loss + le * x_loss + 0.1 * ka * kl
                    + 0.5 * ke * exp_anchor)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = self._tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def fit(self, g, x, x_raw, mask=None, le=1.0, la=1.0, ke=1.0, ka=1.0):
        from dance_tpu.graph import Graph
        assert isinstance(g, Graph)
        x = as_numpy(x).astype(np.float32)
        x_raw = as_numpy(x_raw).astype(np.float32)
        loss_mask = (as_numpy(mask).astype(np.float32) if mask is not None
                     else np.ones_like(x))
        dg = g.to_device()
        gene_feat = dg.ndata.get("feat")
        if gene_feat is None:
            gene_feat = jnp.asarray(x.T)
        adj_target = jnp.asarray((np.asarray(g.adj.todense()) > 0).astype(np.float32))
        counts = x_raw.sum(1)
        sf = jnp.asarray(counts / np.median(counts), jnp.float32)

        key = jax.random.key(self.seed)
        if self.params is None:
            self.params = self.net.init({"params": key}, dg.adj, gene_feat,
                                        jnp.asarray(x), key)["params"]
        self._tx = optax.adamw(self.lr, weight_decay=self.weight_decay)
        opt_state = self._tx.init(self.params)
        # device-resident once — converting inside the loop re-uploads the
        # full expression matrices every epoch
        xj, xrj = jnp.asarray(x), jnp.asarray(x_raw)
        maskj = jnp.asarray(loss_mask)
        for epoch in range(self.n_epochs):
            key, sk = jax.random.split(key)
            self.params, opt_state, loss = self._step(
                self.params, opt_state, dg.adj, gene_feat, xj, xrj, sf,
                adj_target, maskj, sk, le, la, ke, ka)
            if epoch % 50 == 0:
                logger.info("GraphSCI epoch %d, loss %.6f", epoch, float(loss))
        self._cache = (dg, gene_feat, xj)
        return self

    def predict(self, x=None, mask=None, log_space: bool = True):
        """Imputed expression; ``log_space`` maps the NB mean (raw-count scale)
        back through log1p to match the log-normalized input channel."""
        dg, gene_feat, xj = self._cache
        _, mean, _, _, _ = self.net.apply({"params": self.params}, dg.adj, gene_feat,
                                          xj, jax.random.key(0))
        imputed = np.asarray(mean)
        if log_space:
            imputed = np.log1p(imputed)
        if mask is not None:
            m = as_numpy(mask).astype(bool)
            base = np.asarray(xj)
            out = base.copy()
            out[~m] = imputed[~m]
            return out
        return imputed

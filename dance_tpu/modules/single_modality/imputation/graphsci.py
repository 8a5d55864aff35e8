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
from dance_tpu.ops.segment import spmm
from dance_tpu.ops.sparse import CSRMatrix
from dance_tpu.settings import logger
from dance_tpu.transforms import (AnnDataTransform, CellwiseMaskData, Compose,
                                  FilterCellsScanpy, FilterGenesScanpy, SaveRaw,
                                  SetConfig)
from dance_tpu.transforms.graph import FeatureFeatureGraph
from dance_tpu.typing import LogLevel, Optional
from dance_tpu.utils.wrappers import as_numpy


class _BatchNorm(nn.Module):
    """Training-mode BatchNorm1d with learned affine (no running stats — the
    jit-friendly equivalent of the reference's nn.BatchNorm1d in buildNetwork,
    graphsci.py:36-45)."""

    @nn.compact
    def __call__(self, h):
        scale = self.param("scale", nn.initializers.ones, (h.shape[-1],))
        bias = self.param("bias", nn.initializers.zeros, (h.shape[-1],))
        return (h - h.mean(0)) / jnp.sqrt(h.var(0) + 1e-5) * scale + bias


class _GNNModel(nn.Module):
    """Reference GNNModel (graphsci.py:107-125): three GraphConv layers over
    the normalized gene graph — tanh, relu, then a linear mean head and a
    log-std head — and a gaussian sample of the reconstructed adjacency rows.

    (The reference assigns ``z_adj_log_std`` from a second call of
    ``dec_mean`` — an evident copy-paste slip, since a separate
    ``dec_log_std`` layer is constructed and the loss treats them as
    independent; the constructed layer is used here.)"""

    out_feats: int
    n_hidden1: int = 256
    n_hidden2: int = 256

    @nn.compact
    def __call__(self, adj: CSRMatrix, feat, rng, dropout_rng=None,
                 dropout: float = 0.0):
        def dp(h):
            if dropout_rng is None or dropout == 0.0:
                return h
            keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout, h.shape)
            return jnp.where(keep, h / (1.0 - dropout), 0.0)
        # dgl GraphConv(norm='both'): Ã (X W) + b with Ã = D^-1/2 A D^-1/2,
        # carried as the pre-normalized edge weights of the gene graph
        h = nn.tanh(spmm(adj, dp(feat) @ self.param(
            "w1", nn.initializers.glorot_uniform(), (feat.shape[1], self.n_hidden1)))
            + self.param("b1", nn.initializers.zeros, (self.n_hidden1,)))
        h = nn.relu(spmm(adj, dp(h) @ self.param(
            "w2", nn.initializers.glorot_uniform(), (self.n_hidden1, self.n_hidden2)))
            + self.param("b2", nn.initializers.zeros, (self.n_hidden2,)))
        hd = dp(h)
        z_adj_mean = spmm(adj, hd @ self.param(
            "w_mean", nn.initializers.glorot_uniform(),
            (self.n_hidden2, self.out_feats))) + self.param(
            "b_mean", nn.initializers.zeros, (self.out_feats,))
        z_adj_log_std = spmm(adj, hd @ self.param(
            "w_log_std", nn.initializers.glorot_uniform(),
            (self.n_hidden2, self.out_feats))) + self.param(
            "b_log_std", nn.initializers.zeros, (self.out_feats,))
        z_adj = z_adj_mean + jnp.exp(jnp.clip(z_adj_log_std, -10.0, 4.0)) \
            * jax.random.normal(rng, z_adj_mean.shape)
        return z_adj, z_adj_log_std, z_adj_mean


class _AEModel(nn.Module):
    """Reference AEModel (graphsci.py:87-105): the MultiplyLayer mixes
    expression through the reconstructed gene adjacency —
    ``relu(dropout(X) · (z_adj W) + b)`` (graphsci.py:66-85) — then a
    BatchNorm MLP encoder and sigmoid/clamped-softplus/clamped-exp heads."""

    in_feats: int
    n_hidden1: int = 256
    n_hidden2: int = 256

    def setup(self):
        self.mul_fc = nn.Dense(self.in_feats, use_bias=False)
        self.mul_bias = self.param("mul_bias", nn.initializers.zeros,
                                   (self.in_feats,))
        self.enc1 = nn.Dense(self.n_hidden1)
        self.enc2 = nn.Dense(self.n_hidden2)
        self.bn1 = _BatchNorm()
        self.bn2 = _BatchNorm()
        self.dec_pi = nn.Dense(self.in_feats)
        self.dec_disp = nn.Dense(self.in_feats)
        self.dec_mean = nn.Dense(self.in_feats)

    def __call__(self, x, z_adj, size_factors, dropout_rng=None,
                 dropout: float = 0.0):
        def dp(h, i):
            if dropout_rng is None or dropout == 0.0:
                return h
            keep = jax.random.bernoulli(jax.random.fold_in(dropout_rng, i),
                                        1.0 - dropout, h.shape)
            return jnp.where(keep, h / (1.0 - dropout), 0.0)
        h = nn.relu(dp(x, 0) @ self.mul_fc(z_adj) + self.mul_bias)
        h = nn.relu(self.bn1(self.enc1(dp(h, 1))))
        h = nn.relu(self.bn2(self.enc2(dp(h, 2))))
        pi = nn.sigmoid(self.dec_pi(h))
        disp = jnp.clip(nn.softplus(self.dec_disp(h)), 1e-4, 1e4)
        mean = jnp.clip(jnp.exp(self.dec_mean(h)), 1e-5, 1e6)
        x_exp = mean * size_factors[:, None]
        return x_exp, mean, disp, pi


class _GraphSCINet(nn.Module):
    """GNNModel + AEModel joint forward (reference train step,
    graphsci.py:320-324)."""

    n_genes: int
    n_cells: int
    dropout: float = 0.1

    def setup(self):
        self.gnn = _GNNModel(out_feats=self.n_genes)
        self.ae = _AEModel(in_feats=self.n_genes)

    def __call__(self, adj: CSRMatrix, gene_feat, x, sf, rng, *,
                 training: bool = False):
        k1, k2, k3 = jax.random.split(rng, 3)
        p = self.dropout if training else 0.0
        z_adj, z_adj_log_std, z_adj_mean = self.gnn(adj, gene_feat, k1,
                                                    dropout_rng=k2, dropout=p)
        x_exp, mean, disp, pi = self.ae(x, z_adj, sf, k3, dropout=p)
        return z_adj, z_adj_log_std, z_adj_mean, x_exp, mean, disp, pi


def graphsci_loss(batch_raw, adj_orig, z_adj, z_adj_log_std, z_adj_mean, mean,
                  disp, pi, size_factors, mask, le=1.0, la=1.0, ke=1.0, ka=1.0):
    """The reference objective, term for term (graphsci.py:420-501):

    - adjacency: soft-target cross entropy of the reconstructed rows against
      the 0/1 adjacency with per-gene pos_weight and the norm_adj scale,
    - expression: ZINB negative log likelihood on raw counts over ``mask``,
    - kl = ka·kl_adj − ke·kl_exp where kl_exp is the masked recon MSE;
    - total = loss_exp + loss_adj − kl.
    """
    eps = 1e-10
    n = adj_orig.shape[0]
    pos_weight = (n ** 2 - adj_orig.sum(1)) / jnp.maximum(adj_orig.sum(1), eps)
    norm_adj = n * n / jnp.maximum((n * n - adj_orig.sum()) * 2, eps)
    logp = jax.nn.log_softmax(z_adj, axis=-1)
    ce = -(pos_weight * adj_orig * logp).sum(-1)
    loss_adj = la * norm_adj * ce.mean()

    mean = mean * size_factors[:, None]
    disp = jnp.minimum(disp, 1e6)
    t1 = (jax.lax.lgamma(disp + eps) + jax.lax.lgamma(batch_raw + 1)
          - jax.lax.lgamma(batch_raw + disp + eps))
    t2 = ((disp + batch_raw) * jnp.log(1.0 + mean / (disp + eps))
          + batch_raw * (jnp.log(disp + eps) - jnp.log(mean + eps)))
    nb = t1 + t2
    zero_nb = jnp.power(disp / (disp + mean + eps), disp)
    zero_case = -jnp.log(pi + (1 - pi) * zero_nb + eps)
    pointwise = jnp.where(batch_raw < 1e-8, zero_case, nb)
    loss_exp = le * (pointwise * mask).sum() / jnp.maximum(mask.sum(), 1.0)
    log_lik = loss_exp + loss_adj

    kl_adj = (0.5 / batch_raw.shape[0]) * jnp.mean(
        jnp.sum(1 + 2 * z_adj_log_std - jnp.square(z_adj_mean)
                - jnp.square(jnp.exp(jnp.clip(z_adj_log_std, -10.0, 4.0))), 1))
    z_exp = mean  # already scaled by size factors above
    kl_exp = 0.5 / batch_raw.shape[1] * (
        ((z_exp - batch_raw) ** 2) * mask).sum() / jnp.maximum(mask.sum(), 1.0)
    kl = ka * kl_adj - ke * kl_exp
    return loss_adj, loss_exp, log_lik, kl, log_lik - kl


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
        self.net = _GraphSCINet(n_genes=num_genes, n_cells=num_cells,
                                dropout=dropout)
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
            z_adj, z_log_std, z_mean, x_exp, mean, disp, pi = self.net.apply(
                {"params": params}, adj, gene_feat, x, sf, key, training=True)
            *_, total = graphsci_loss(x_raw, adj_target, z_adj, z_log_std,
                                      z_mean, mean, disp, pi, sf, loss_mask,
                                      le, la, ke, ka)
            return total

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = self._tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @partial(jax.jit, static_argnames=("self",))
    def _train_epochs(self, params, opt_state, adj, gene_feat, x, x_raw, sf,
                      adj_target, loss_mask, keys, le, la, ke, ka):
        """All epochs in one compiled scan — per-epoch dispatch costs ~370 ms
        over the axon relay vs tens of ms of step compute."""
        def epoch(carry, sk):
            params, opt_state = carry
            params, opt_state, loss = self._step(
                params, opt_state, adj, gene_feat, x, x_raw, sf, adj_target,
                loss_mask, sk, le, la, ke, ka)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(epoch, (params, opt_state),
                                                   keys)
        return params, opt_state, losses

    def fit(self, g, x, x_raw, mask=None, le=1.0, la=1.0, ke=1.0, ka=1.0):
        from dance_tpu.graph import Graph
        assert isinstance(g, Graph)
        x = as_numpy(x).astype(np.float32)
        x_raw = as_numpy(x_raw).astype(np.float32)
        loss_mask = (as_numpy(mask).astype(np.float32) if mask is not None
                     else np.ones_like(x))
        # device inputs cached across fits by content hash: two full
        # expression matrices + the dense adjacency target re-upload per fit
        # otherwise, dwarfing the per-epoch training cost on the relay
        import hashlib
        h = hashlib.md5(np.ascontiguousarray(x))
        h.update(np.ascontiguousarray(x_raw))
        h.update(np.ascontiguousarray(loss_mask))
        cache_key = (id(g), g.adj.shape, g.adj.nnz, x.shape, h.hexdigest())
        if getattr(self, "_fit_cache_key", None) == cache_key:
            dg, gene_feat, adj_target, sf, xj, xrj, maskj = self._fit_cache
        else:
            dg = g.to_device()
            # the gene correlation graph sits far above the dense-regime
            # threshold (|corr|>thr keeps a few-% density) and the conv
            # operand is gene_feat (g × n_cells) — the CSR gather/segment
            # path would stream nnz×n_cells message bytes per conv; one MXU
            # matmul does the same contraction at peak (see DenseAdj)
            from dance_tpu.ops.pallas_kernels import choose_adj_format
            if choose_adj_format(g.adj, reorder=False) == "dense":
                from dance_tpu.ops.sparse import DenseAdj
                deg = np.asarray((g.adj != 0).sum(1)).ravel().astype(np.float32)
                dg = dg._replace(adj=DenseAdj(
                    jnp.asarray(np.asarray(g.adj.todense()), jnp.float32),
                    jnp.asarray(deg)))
            gene_feat = dg.ndata.get("feat")
            if gene_feat is None:
                gene_feat = jnp.asarray(x.T)
            adj_target = jnp.asarray(
                (np.asarray(g.adj.todense()) > 0).astype(np.float32))
            counts = x_raw.sum(1)
            sf = jnp.asarray(counts / np.median(counts), jnp.float32)
            xj, xrj = jnp.asarray(x), jnp.asarray(x_raw)
            maskj = jnp.asarray(loss_mask)
            self._fit_cache_key = cache_key
            self._fit_cache = (dg, gene_feat, adj_target, sf, xj, xrj, maskj)

        key = jax.random.key(self.seed)
        if self.params is None:
            self.params = self.net.init({"params": key}, dg.adj, gene_feat,
                                        xj, sf, key)["params"]
        # reference uses Adam with weight_decay (graphsci.py:274)
        self._tx = optax.adamw(self.lr, weight_decay=self.weight_decay)
        opt_state = self._tx.init(self.params)
        keys = jax.random.split(jax.random.fold_in(key, 23), self.n_epochs)
        self.params, opt_state, losses = self._train_epochs(
            self.params, opt_state, dg.adj, gene_feat, xj, xrj, sf,
            adj_target, maskj, keys, le, la, ke, ka)
        losses = np.asarray(losses)
        for epoch in range(0, self.n_epochs, 50):
            logger.info("GraphSCI epoch %d, loss %.6f", epoch,
                        float(losses[epoch]))
        self._cache = (dg, gene_feat, xj, sf)
        return self

    def predict(self, x=None, mask=None, log_space: bool = True):
        """Imputed expression; ``log_space`` maps the NB mean (raw-count scale)
        back through log1p to match the log-normalized input channel."""
        dg, gene_feat, xj, sf = self._cache
        # eval path (reference evaluate/predict): z_exp = mean * size_factors
        *_, x_exp, mean, _, _ = self.net.apply({"params": self.params}, dg.adj,
                                               gene_feat, xj, sf,
                                               jax.random.key(0))
        imputed = np.asarray(x_exp)
        if log_space:
            imputed = np.log1p(imputed)
        if mask is not None:
            m = as_numpy(mask).astype(bool)
            base = np.asarray(xj)
            out = base.copy()
            out[~m] = imputed[~m]
            return out
        return imputed

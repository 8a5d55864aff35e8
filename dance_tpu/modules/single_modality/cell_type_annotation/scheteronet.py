"""scHeteroNet: heterophily-aware GNN annotation with OOD detection.

Parity target: dance/modules/single_modality/cell_type_annotation/
scheteronet.py (HeteroNet encoder combining ego embeddings with low/high-pass
neighbor aggregations, auxiliary ZINB decoder, and energy-belief-propagation
OOD scoring :611-673).
"""

from functools import partial
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
import scipy.sparse as sp

from dance_tpu.modules.base import BaseClassificationMethod
from dance_tpu.nn.zinb_ae import disp_act, mean_act
from dance_tpu.ops.segment import spmm
from dance_tpu.ops.sparse import CSRMatrix, csr_from_scipy
from dance_tpu.settings import logger
from dance_tpu.transforms import (AnnDataTransform, Compose, FilterCellsScanpy,
                                  FilterCellsType,
                                  HighlyVariableGenesLogarithmizedByTopGenes, Log1P,
                                  NormalizeTotal, SaveRaw, SetConfig, UpdateSizeFactors)
from dance_tpu.transforms.graph.heteronet_graph import HeteronetGraph
from dance_tpu.typing import LogLevel, Optional
from dance_tpu.utils.loss import zinb_nll
from dance_tpu.utils.wrappers import as_numpy


class _HeteroNet(nn.Module):
    """Ego + low-pass (A h) + high-pass (h − A h) channel mixing per layer."""

    n_classes: int
    hidden: int = 64
    num_layers: int = 2
    dec_dims: Tuple[int, ...] = (32, 64, 128)
    n_genes: int = 0

    def setup(self):
        self.ego = [nn.Dense(self.hidden) for _ in range(self.num_layers)]
        self.low = [nn.Dense(self.hidden) for _ in range(self.num_layers)]
        self.high = [nn.Dense(self.hidden) for _ in range(self.num_layers)]
        self.head = nn.Dense(self.n_classes)
        self.dec_stack = [nn.Dense(d) for d in self.dec_dims]
        self.dec_mean = nn.Dense(self.n_genes)
        self.dec_disp = nn.Dense(self.n_genes)
        self.dec_pi = nn.Dense(self.n_genes)

    def embed(self, adj: CSRMatrix, x):
        h = x
        for ego, low, high in zip(self.ego, self.low, self.high):
            ah = spmm(adj, h, op="mean")
            h = nn.relu(ego(h) + low(ah) + high(h - ah))
        return h

    def zinb(self, h):
        d = h
        for layer in self.dec_stack:
            d = nn.relu(layer(d))
        return mean_act(self.dec_mean(d)), disp_act(self.dec_disp(d)), nn.sigmoid(
            self.dec_pi(d))

    def __call__(self, adj: CSRMatrix, x):
        h = self.embed(adj, x)
        return self.head(h), h


class scHeteroNet(BaseClassificationMethod):
    """scHeteroNet model (parity: scheteronet.py:576)."""

    _DISPLAY_ATTRS = ("hidden_channels", "num_layers")

    def __init__(self, d: int = 0, c: int = 0, edge_index=None, num_nodes: int = 0,
                 hidden_channels: int = 64, num_layers: int = 2, dropout: float = 0.0,
                 use_bn: bool = False, device: str = "auto", min_loss: float = np.inf,
                 seed: int = 0):
        self.hidden_channels = hidden_channels
        self.num_layers = num_layers
        self.seed = seed
        self.params = None

    @staticmethod
    def preprocessing_pipeline(log_level: LogLevel = "INFO"):
        return Compose(
            FilterCellsType(),
            AnnDataTransform("sc.pp.filter_genes", min_counts=3),
            FilterCellsScanpy(min_counts=1),
            HighlyVariableGenesLogarithmizedByTopGenes(n_top_genes=4000,
                                                       flavor="cell_ranger"),
            SaveRaw(),
            NormalizeTotal(),
            UpdateSizeFactors(),
            Log1P(),
            HeteronetGraph(),
            SetConfig({"label_channel": "cell_type"}),
            log_level=log_level,
        )

    @partial(jax.jit, static_argnames=("self", "use_zinb"))
    def _step(self, params, opt_state, adj, x, x_raw, sf, y, mask, zinb_weight,
              use_zinb: bool):
        def loss_fn(params):
            logits, h = self.net.apply({"params": params}, adj, x)
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, jnp.maximum(y, 0))
            loss = (ce * mask).sum() / jnp.maximum(mask.sum(), 1.0)
            if use_zinb:
                mean, disp, pi = self.net.apply({"params": params}, h,
                                                method=self.net.zinb)
                loss = loss + zinb_weight * zinb_nll(x_raw, mean, disp, pi,
                                                     scale_factor=sf[:, None])
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = self._tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def fit(self, graph, y, x_raw=None, size_factors=None, use_zinb: bool = True,
            zinb_weight: float = 0.1, epochs: int = 200, lr: float = 1e-2,
            train_idx=None):
        from dance_tpu.graph import Graph
        assert isinstance(graph, Graph)
        x = np.asarray(graph.ndata["feat"], np.float32)
        y = as_numpy(y)
        if y.ndim == 2:
            y = y.argmax(1)
        n = x.shape[0]
        self.num_labels = int(y.max()) + 1
        adj = csr_from_scipy(graph.adj + sp.eye(n, format="csr", dtype=np.float32))
        if x_raw is None:
            x_raw, use_zinb = np.zeros_like(x), False
        if size_factors is None:
            counts = np.maximum(np.asarray(x_raw).sum(1), 1.0)
            size_factors = counts / np.median(counts)
        mask = np.zeros(n, np.float32)
        mask[np.asarray(train_idx if train_idx is not None else np.arange(n))] = 1

        self.net = _HeteroNet(n_classes=self.num_labels, hidden=self.hidden_channels,
                              num_layers=self.num_layers, n_genes=x.shape[1])
        key = jax.random.key(self.seed)
        # init must reach the ZINB decoder branch too, not just the classifier
        self.params = self.net.init(
            key, adj, jnp.asarray(x),
            method=lambda m, a, xx: (m(a, xx), m.zinb(m.embed(a, xx))))["params"]
        self._tx = optax.adam(lr)
        opt_state = self._tx.init(self.params)
        for epoch in range(epochs):
            self.params, opt_state, loss = self._step(
                self.params, opt_state, adj, jnp.asarray(x),
                jnp.asarray(x_raw, jnp.float32), jnp.asarray(size_factors, jnp.float32),
                jnp.asarray(y, jnp.int32), jnp.asarray(mask), zinb_weight, use_zinb)
            if epoch % 50 == 0:
                logger.info("scHeteroNet epoch %d, loss %.5f", epoch, float(loss))
        self._cache = (adj, jnp.asarray(x))
        return self

    def propagation(self, e, adj: CSRMatrix, prop_layers: int = 1, alpha: float = 0.5):
        """Energy belief propagation over the row-normalized adjacency
        (parity: scheteronet.py:611)."""
        e = jnp.asarray(e)[:, None]
        for _ in range(prop_layers):
            e = e * alpha + spmm(adj, e, weighted=False, op="mean") * (1 - alpha)
        return np.asarray(e[:, 0])

    def detect(self, graph=None, node_idx=None, T: float = 1.0, use_prop: bool = True,
               oodprop: int = 2, oodalpha: float = 0.5, **kwargs):
        """Negative-energy OOD score per node (higher = in-distribution)."""
        adj, x = self._cache
        logits, _ = self.net.apply({"params": self.params}, adj, x)
        neg_energy = T * jax.scipy.special.logsumexp(logits / T, axis=-1)
        if use_prop:
            neg_energy = self.propagation(neg_energy, adj, oodprop, oodalpha)
        neg_energy = np.asarray(neg_energy)
        return neg_energy[node_idx] if node_idx is not None else neg_energy

    def evaluate_ood(self, ind_idx, ood_idx, **detect_kwargs):
        """(auroc, aupr, fpr@95) for OOD detection (parity: scheteronet.py:760)."""
        from dance_tpu.utils.metrics import ood_measures
        scores = self.detect(**detect_kwargs)
        return ood_measures(scores[np.asarray(ind_idx)], scores[np.asarray(ood_idx)])

    def predict_proba(self, graph=None):
        adj, x = self._cache
        logits, _ = self.net.apply({"params": self.params}, adj, x)
        return np.asarray(jax.nn.softmax(logits, axis=-1))

    def predict(self, graph=None, idx=None):
        pred = self.predict_proba(graph).argmax(1)
        return pred[idx] if idx is not None else pred

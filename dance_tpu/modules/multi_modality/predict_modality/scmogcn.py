"""scMoGNN: cell-feature bipartite GNN for modality prediction.

Parity target: dance/modules/multi_modality/predict_modality/scmogcn.py
(ScMoGCN :417 — alternating cell↔feature propagation over the expression
bipartite graph with layer-weighted readout; wrapper :23 with full-batch and
sampled fits). Full-graph propagation is a pair of CSR SpMMs per layer on TPU;
the DGL sampling path (scmogcn.py:223) is unnecessary on-chip and replaced by
the same full-batch step.
"""

from functools import partial
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
import scipy.sparse as sp

from dance_tpu.modules.base import BaseRegressionMethod
from dance_tpu.ops.sparse import CSRMatrix, csr_from_scipy, csr_matmat, csr_rmatmat
from dance_tpu.settings import logger
from dance_tpu.transforms import SetConfig
from dance_tpu.typing import LogLevel, Optional
from dance_tpu.utils.wrappers import as_numpy


class _ScMoGCN(nn.Module):
    out_dim: int
    hidden: int = 64
    n_layers: int = 2

    @nn.compact
    def __call__(self, adj, cell_feat, feat_feat):
        """adj: (cells × features) normalized expression — a :class:`CSRMatrix`
        or a :class:`~dance_tpu.ops.pallas_kernels.BipartiteBSR` (Pallas path);
        returns cell outputs."""
        from dance_tpu.ops.pallas_kernels import BipartiteBSR
        from dance_tpu.ops.segment import spmm
        n_cells, n_feats = cell_feat.shape[0], feat_feat.shape[0]
        if isinstance(adj, BipartiteBSR):
            def matmat(h):
                return spmm(adj.fwd, h, n_out=n_cells)

            def rmatmat(h):
                return spmm(adj.bwd, h, n_out=n_feats)
        else:
            def matmat(h):
                return csr_matmat(adj, h)

            def rmatmat(h):
                return csr_rmatmat(adj, h)
        hc = nn.relu(nn.Dense(self.hidden)(cell_feat))
        hf = nn.relu(nn.Dense(self.hidden)(feat_feat))
        layer_outs = [hc]
        for _ in range(self.n_layers):
            hf = nn.relu(nn.Dense(self.hidden)(rmatmat(hc)) + nn.Dense(
                self.hidden, use_bias=False)(hf))
            hc = nn.relu(nn.Dense(self.hidden)(matmat(hf)) + nn.Dense(
                self.hidden, use_bias=False)(hc))
            layer_outs.append(hc)
        # learned layer-weighted readout (parity: scMoGNN's weighted sum)
        w = nn.softmax(self.param("layer_weights", nn.initializers.zeros,
                                  (len(layer_outs),)))
        h = sum(wi * li for wi, li in zip(w, layer_outs))
        h = nn.relu(nn.Dense(self.hidden)(h))
        return nn.Dense(self.out_dim)(h)


class ScMoGCNWrapper(BaseRegressionMethod):
    """scMoGNN wrapper (parity: scmogcn.py:23)."""

    _DISPLAY_ATTRS = ("hidden", "n_layers")

    def __init__(self, args=None, hidden: int = 64, n_layers: int = 2, seed: int = 0):
        self.args = args
        self.hidden = hidden
        self.n_layers = n_layers
        self.seed = seed
        self.params = None

    @staticmethod
    def preprocessing_pipeline(log_level: LogLevel = "INFO"):
        return SetConfig({"feature_mod": "mod1", "label_mod": "mod2",
                          "feature_channel": None, "feature_channel_type": "X",
                          "label_channel": None, "label_channel_type": "X"},
                         log_level=log_level)

    @staticmethod
    def _build_graph(x: np.ndarray, use_bsr="auto", bsr_block: int = 128):
        """Row/column-normalized expression bipartite adjacency.

        ``use_bsr=True`` tiles the adjacency (and its transpose) to BSR so
        both propagation directions run on the Pallas kernel — expression
        bipartite graphs are dense at tile granularity, so no reordering is
        needed. ``"auto"`` (default) engages it on TPU when the natural-order
        tiling is dense enough to win."""
        from dance_tpu.ops.pallas_kernels import bipartite_bsr, resolve_use_bsr
        a = sp.csr_matrix(x)
        r = np.asarray(a.sum(1)).ravel()
        a = sp.diags(1.0 / np.maximum(r, 1e-12)) @ a
        if resolve_use_bsr(use_bsr, a, bsr_block, reorder=False):
            return bipartite_bsr(a, block=bsr_block)
        return csr_from_scipy(a)

    @partial(jax.jit, static_argnames=("self",))
    def _step(self, params, opt_state, adj, cell_feat, feat_feat, y, train_mask):
        def loss_fn(params):
            pred = self.net.apply({"params": params}, adj, cell_feat, feat_feat)
            se = ((pred - y) ** 2).mean(1)
            return (se * train_mask).sum() / jnp.maximum(train_mask.sum(), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = self._tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def fit(self, x_train, y_train, x_test=None, epochs: int = 200, lr: float = 1e-2,
            weight_decay: float = 1e-5, use_bsr="auto",
            bsr_block: int = 128):
        """Trains on train cells; when x_test is given, test cells join the graph
        (transductive) with masked loss. ``use_bsr=True`` runs both propagation
        directions on the Pallas block-sparse kernel."""
        x_tr = as_numpy(x_train).astype(np.float32)
        y_tr = as_numpy(y_train).astype(np.float32)
        if x_test is not None:
            x_all = np.concatenate([x_tr, as_numpy(x_test).astype(np.float32)])
            train_mask = np.concatenate([np.ones(len(x_tr)),
                                         np.zeros(len(x_all) - len(x_tr))])
            y_all = np.concatenate([y_tr, np.zeros((len(x_all) - len(x_tr),
                                                    y_tr.shape[1]), np.float32)])
        else:
            x_all, train_mask, y_all = x_tr, np.ones(len(x_tr)), y_tr
        self._n_train = len(x_tr)

        adj = self._build_graph(x_all, use_bsr=use_bsr, bsr_block=bsr_block)
        cell_feat = jnp.asarray(np.log1p(x_all))
        feat_feat = jnp.asarray(np.log1p(x_all).T @ np.eye(x_all.shape[0],
                                                           min(64, x_all.shape[0]),
                                                           dtype=np.float32))
        self.net = _ScMoGCN(out_dim=y_tr.shape[1], hidden=self.hidden,
                            n_layers=self.n_layers)
        key = jax.random.key(self.seed)
        self.params = self.net.init(key, adj, cell_feat, feat_feat)["params"]
        self._tx = optax.adamw(lr, weight_decay=weight_decay)
        opt_state = self._tx.init(self.params)
        yj = jnp.asarray(y_all)
        mj = jnp.asarray(train_mask, jnp.float32)
        for epoch in range(epochs):
            self.params, opt_state, loss = self._step(self.params, opt_state, adj,
                                                      cell_feat, feat_feat, yj, mj)
            if epoch % 50 == 0:
                logger.info("scMoGNN epoch %d, MSE %.5f", epoch, float(loss))
        self._cache = (adj, cell_feat, feat_feat)
        return self

    def predict(self, x=None, idx=None):
        adj, cell_feat, feat_feat = self._cache
        pred = np.asarray(self.net.apply({"params": self.params}, adj, cell_feat,
                                         feat_feat))
        if idx is not None:
            return pred[idx]
        if x is not None and len(as_numpy(x)) != pred.shape[0]:
            return pred[self._n_train:]
        return pred

    def score(self, x, y, *, score_func=None, return_pred: bool = False, **kwargs):
        from dance_tpu.utils.metrics import resolve_score_func
        pred = self.predict(x)
        func = resolve_score_func(score_func or "rmse")
        s = func(as_numpy(y), pred)
        return (s, pred) if return_pred else s


# reference class name for the propagation trunk (scmogcn.py:417)
ScMoGCN = _ScMoGCN

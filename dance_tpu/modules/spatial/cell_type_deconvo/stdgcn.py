"""stdGCN: dual-adjacency conditional GCN deconvolution.

Parity target: dance/modules/spatial/cell_type_deconvo/stdgcn.py (1954 LoC:
conGCN :95 consuming an expression kNN adjacency and a spatial adjacency whose
contributions are mixed by learned weights, trained on pseudo-spots and
inferred on real spots; the embedded pseudo-spot/marker-gene sub-pipeline
:581-1373 maps onto the framework transforms PseudoMixture +
FilterGenesMarker + graph builders).
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
from dance_tpu.ops.segment import spmm
from dance_tpu.ops.sparse import CSRMatrix, csr_from_scipy
from dance_tpu.settings import logger
from dance_tpu.typing import Any, LogLevel, Optional
from dance_tpu.utils.metrics import resolve_score_func
from dance_tpu.utils.wrappers import as_numpy


class _ConGCN(nn.Module):
    """GCN whose propagation mixes two adjacencies with learned weights
    (parity: stdgcn.py conGraphConvolutionlayer :63)."""

    hidden: Tuple[int, ...]
    out_dim: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, adj_exp: CSRMatrix, adj_sp: CSRMatrix, x, *,
                 training: bool = False):
        mix = self.param("adj_mix", nn.initializers.constant(0.5), (len(self.hidden) + 1,))
        h = x
        for i, d in enumerate(self.hidden):
            m = nn.sigmoid(mix[i])
            h = nn.Dense(d, use_bias=False)(h)
            h = m * spmm(adj_exp, h) + (1 - m) * spmm(adj_sp, h)
            h = nn.relu(h)
            h = nn.Dropout(self.dropout, deterministic=not training)(h)
        m = nn.sigmoid(mix[-1])
        h = nn.Dense(self.out_dim, use_bias=False)(h)
        h = m * spmm(adj_exp, h) + (1 - m) * spmm(adj_sp, h)
        return nn.softmax(h, axis=-1)


def _norm_adj(adj: sp.spmatrix) -> CSRMatrix:
    adj = sp.csr_matrix(adj) + sp.eye(adj.shape[0], format="csr", dtype=np.float32)
    deg = np.asarray(adj.sum(1)).ravel()
    dinv = 1.0 / np.sqrt(np.maximum(deg, 1e-12))
    return csr_from_scipy(sp.diags(dinv) @ adj @ sp.diags(dinv))


class StdGCN(BaseRegressionMethod):
    """stdGCN model (parity: stdgcn.py)."""

    _DISPLAY_ATTRS = ("hidden", "dropout")

    def __init__(self, hidden: Tuple[int, ...] = (256, 128), dropout: float = 0.1,
                 seed: int = 0):
        self.hidden = tuple(hidden)
        self.dropout = dropout
        self.seed = seed
        self.params = None

    @staticmethod
    def preprocessing_pipeline(n_pseudo: int = 500, log_level: LogLevel = "INFO"):
        from dance_tpu.transforms import (CellTopicProfile, Compose, FilterGenesMarker,
                                          SetConfig)
        from dance_tpu.transforms.pseudobulk import PseudoMixture
        return Compose(
            PseudoMixture(n_pseudo=n_pseudo, out_split_name="pseudo"),
            CellTopicProfile(ct_select="auto", ct_key="cellType", split_name="pseudo"),
            FilterGenesMarker(ct_profile_channel="CellTopicProfile", threshold=1.25),
            SetConfig({"feature_channel": [None, "spatial"],
                       "feature_channel_type": ["X", "obsm"],
                       "label_channel": "cell_type_portion"}),
            log_level=log_level,
        )

    @partial(jax.jit, static_argnames=("self",))
    def _step(self, params, opt_state, adj_exp, adj_sp, x, y, mask, key):
        def loss_fn(params):
            pred = self.net.apply({"params": params}, adj_exp, adj_sp, x, training=True,
                                  rngs={"dropout": key})
            ce = -(y * jnp.log(pred + 1e-10)).sum(1)
            return (ce * mask).sum() / jnp.maximum(mask.sum(), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = self._tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def fit(self, inputs, y, train_mask=None, lr: float = 1e-2,
            max_epochs: int = 300, k_exp: int = 10, k_sp: int = 6):
        """inputs = (features for all spots [pseudo+real], spatial coords with
        zeros for pseudo-spots); y: portions (pseudo rows labeled)."""
        from dance_tpu.ops.neighbors import knn_graph
        x, coords = inputs
        x = as_numpy(x).astype(np.float32)
        coords = as_numpy(coords).astype(np.float32)
        n = x.shape[0]
        adj_exp = _norm_adj(knn_graph(x, min(k_exp, n - 1), mode="connectivity",
                                      include_self=False))
        # spatial graph only among real spots (nonzero coords); pseudo-spots
        # get self-loops through _norm_adj
        real = np.abs(coords).sum(1) > 0
        adj_sp_raw = sp.lil_matrix((n, n), dtype=np.float32)
        if real.sum() > k_sp + 1:
            idx = np.nonzero(real)[0]
            sub = knn_graph(coords[idx], min(k_sp, len(idx) - 1), mode="connectivity",
                            include_self=False)
            sub = sp.coo_matrix(sub)
            adj_sp_raw[idx[sub.row], idx[sub.col]] = sub.data
        adj_sp = _norm_adj(adj_sp_raw.tocsr())

        y = jnp.asarray(as_numpy(y), jnp.float32)
        if train_mask is None:
            train_mask = np.asarray(as_numpy(y)).sum(1) > 0
        mask = jnp.asarray(np.asarray(train_mask), jnp.float32)

        self.net = _ConGCN(hidden=self.hidden, out_dim=y.shape[1],
                           dropout=self.dropout)
        key = jax.random.key(self.seed)
        xj = jnp.asarray(x)
        self.params = self.net.init({"params": key, "dropout": key}, adj_exp, adj_sp,
                                    xj)["params"]
        self._tx = optax.adam(lr)
        opt_state = self._tx.init(self.params)
        for epoch in range(max_epochs):
            key, sk = jax.random.split(key)
            self.params, opt_state, loss = self._step(self.params, opt_state, adj_exp,
                                                      adj_sp, xj, y, mask, sk)
            if epoch % 100 == 0:
                logger.info("stdGCN epoch %d, CE %.5f", epoch, float(loss))
        self._cache = (adj_exp, adj_sp, xj)
        return self

    def predict(self, x: Optional[Any] = None):
        adj_exp, adj_sp, xj = self._cache
        return np.asarray(self.net.apply({"params": self.params}, adj_exp, adj_sp, xj))

    def score(self, x, y, *, score_func=None, return_pred: bool = False, test_idx=None,
              **kwargs):
        pred = self.predict(x)
        y = as_numpy(y)
        if test_idx is not None:
            pred, y = pred[test_idx], y[test_idx]
        func = resolve_score_func(score_func or "mse")
        s = func(y, pred)
        return (s, pred) if return_pred else s

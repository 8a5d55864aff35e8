"""DSTG: semi-supervised GCN on the pseudo/real spot link graph.

Parity target: dance/modules/spatial/cell_type_deconvo/dstg.py (2-layer GCN
over the DSTGraph adjacency, softmax output trained with cross-entropy against
pseudo-spot cell-type portions on the labeled/train nodes).
"""

from functools import partial

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
from dance_tpu.transforms import CellTopicProfile, Compose, FilterGenesMarker, SetConfig
from dance_tpu.transforms.cell_feature import CellPCA
from dance_tpu.transforms.graph import DSTGraph
from dance_tpu.transforms.pseudobulk import PseudoMixture
from dance_tpu.typing import Any, LogLevel, Optional
from dance_tpu.utils.metrics import resolve_score_func
from dance_tpu.utils.wrappers import as_numpy


class _GCN(nn.Module):
    hidden: int
    out_dim: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, adj: CSRMatrix, x, *, training: bool = False):
        h = nn.Dropout(self.dropout, deterministic=not training)(x)
        h = nn.relu(spmm(adj, nn.Dense(self.hidden, use_bias=False)(h)))
        h = nn.Dropout(self.dropout, deterministic=not training)(h)
        h = spmm(adj, nn.Dense(self.out_dim, use_bias=False)(h))
        return nn.softmax(h, axis=-1)


class DSTG(BaseRegressionMethod):
    """DSTG model (parity: dstg.py:145)."""

    _DISPLAY_ATTRS = ("nhid", "bias", "dropout")

    def __init__(self, nhid: int = 32, bias: bool = False, dropout: float = 0.0,
                 device: str = "auto", seed: int = 0):
        self.nhid = nhid
        self.bias = bias
        self.dropout = dropout
        self.seed = seed
        self.params = None

    @staticmethod
    def preprocessing_pipeline(n_pseudo: int = 500, n_top_genes: int = 2000,
                               k_filter: int = 200, num_cc: int = 30,
                               log_level: LogLevel = "INFO"):
        return Compose(
            PseudoMixture(n_pseudo=n_pseudo, out_split_name="pseudo"),
            CellTopicProfile(ct_select="auto", ct_key="cellType", split_name="pseudo"),
            FilterGenesMarker(ct_profile_channel="CellTopicProfile", threshold=1.25),
            CellPCA(n_components=min(num_cc, 50)),
            DSTGraph(k_filter=k_filter, num_cc=num_cc, ref_split="pseudo",
                     inf_split="test"),
            SetConfig({"feature_channel": ["CellPCA", "DSTGraph"],
                       "feature_channel_type": ["obsm", "obsp"],
                       "label_channel": "cell_type_portion"}),
            log_level=log_level,
        )

    @partial(jax.jit, static_argnames=("self",))
    def _step(self, params, opt_state, adj, x, y, mask, key):
        def loss_fn(params):
            pred = self.net.apply({"params": params}, adj, x, training=True,
                                  rngs={"dropout": key})
            ce = -(y * jnp.log(pred + 1e-10)).sum(1)
            return (ce * mask).sum() / jnp.maximum(mask.sum(), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = self._tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def fit(self, inputs, y, lr: float = 0.005, max_epochs: int = 300,
            weight_decay: float = 0.0, train_mask=None, use_bsr="auto",
            bsr_block: int = 128):
        """inputs=(x features over all nodes, adjacency); y: portions with
        pseudo rows labeled (train) and real rows to predict.

        ``use_bsr=True`` RCM-bands the pseudo/real link graph and runs both
        GCN aggregations through the Pallas block-sparse SpMM; predictions are
        un-permuted back to the caller's node order. The default ``"auto"``
        engages it on TPU when the banded tiling is dense enough to win."""
        from dance_tpu.ops.pallas_kernels import resolve_use_bsr
        x, adj = inputs
        use_bsr = resolve_use_bsr(use_bsr, sp.csr_matrix(adj), bsr_block)
        x = as_numpy(x).astype(np.float32)
        y = as_numpy(y).astype(np.float32)
        if train_mask is None:
            train_mask = y.sum(1) > 0
        train_mask = np.asarray(train_mask)
        self._perm = None
        if use_bsr:
            from dance_tpu.ops.pallas_kernels import bsr_with_rcm
            self._perm, adj = bsr_with_rcm(sp.csr_matrix(adj), block=bsr_block)
            x, y, train_mask = (x[self._perm], y[self._perm],
                                train_mask[self._perm])
        else:
            adj = csr_from_scipy(sp.csr_matrix(adj))
        x = jnp.asarray(x)
        y = jnp.asarray(y)
        mask = jnp.asarray(train_mask, jnp.float32)

        self.net = _GCN(hidden=self.nhid, out_dim=y.shape[1], dropout=self.dropout)
        key = jax.random.key(self.seed)
        self.params = self.net.init({"params": key, "dropout": key}, adj, x)["params"]
        self._tx = (optax.adamw(lr, weight_decay=weight_decay) if weight_decay
                    else optax.adam(lr))
        opt_state = self._tx.init(self.params)
        for epoch in range(max_epochs):
            key, sk = jax.random.split(key)
            self.params, opt_state, loss = self._step(self.params, opt_state, adj, x, y,
                                                      mask, sk)
            if epoch % 100 == 0:
                logger.info("DSTG epoch %d, CE %.5f", epoch, float(loss))
        self._cache = (adj, x)
        return self

    def predict(self, x: Optional[Any] = None):
        from dance_tpu.ops.pallas_kernels import unpermute
        adj, feats = self._cache
        pred = np.asarray(self.net.apply({"params": self.params}, adj, feats))
        return unpermute(getattr(self, "_perm", None), pred)

    def score(self, x, y, *, score_func=None, return_pred: bool = False, test_idx=None,
              **kwargs):
        pred = self.predict(x)
        y = as_numpy(y)
        if test_idx is not None:
            pred, y = pred[test_idx], y[test_idx]
        func = resolve_score_func(score_func or "mse")
        s = func(y, pred)
        return (s, pred) if return_pred else s


def split_mask_for_validation(pseudo_train_mask, valid_ratio: float = 0.3,
                              random_seed=None):
    """Split a boolean mask's True entries into train/validation masks
    (parity: dstg.py:342). ``valid_ratio`` of the True entries move to the
    validation mask; False entries stay False in both outputs."""
    mask = np.asarray(pseudo_train_mask, dtype=bool)
    if not 0.0 <= valid_ratio <= 1.0:
        raise ValueError(f"valid_ratio must be in [0, 1], got {valid_ratio}")
    idx = np.flatnonzero(mask)
    rng = np.random.default_rng(random_seed)
    n_valid = int(round(len(idx) * valid_ratio))
    valid_idx = rng.choice(idx, size=n_valid, replace=False)
    valid_mask = np.zeros_like(mask)
    valid_mask[valid_idx] = True
    train_mask = mask & ~valid_mask
    return train_mask, valid_mask


def masked_softmax_cross_entropy(preds, labels, mask):
    """Mean softmax CE over masked nodes (parity: dstg.py
    masked_softmax_cross_entropy; preds are logits)."""
    import optax
    preds = jnp.asarray(preds)
    labels = jnp.asarray(labels, jnp.float32)
    mask = jnp.asarray(mask, jnp.float32)
    loss = optax.softmax_cross_entropy(preds, labels)
    mask = mask / jnp.maximum(mask.mean(), 1e-12)
    return jnp.mean(loss * mask)

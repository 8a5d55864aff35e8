"""JAE: joint autoencoder with auxiliary supervision heads.

Parity target: dance/modules/multi_modality/joint_embedding/jae.py (shared
encoder over concatenated modalities + reconstruction decoder + auxiliary
cell-type / batch / cell-cycle heads).
"""

from functools import partial
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from dance_tpu.modules.base import BaseRegressionMethod
from dance_tpu.nn.zinb_ae import MLPStack
from dance_tpu.settings import logger
from dance_tpu.transforms import SetConfig
from dance_tpu.typing import LogLevel, Optional
from dance_tpu.utils.wrappers import as_numpy


class _JAE(nn.Module):
    in_dim: int
    z_dim: int = 32
    n_cell_types: int = 0
    n_batches: int = 0
    hidden: Tuple[int, ...] = (150, 120, 100)

    def setup(self):
        self.encoder = MLPStack(self.hidden)
        self.enc_out = nn.Dense(self.z_dim)
        self.decoder = MLPStack(self.hidden[::-1])
        self.dec_out = nn.Dense(self.in_dim)
        self.ct_head = nn.Dense(max(self.n_cell_types, 1))
        self.batch_head = nn.Dense(max(self.n_batches, 1))
        self.cycle_head = nn.Dense(2)

    def encode(self, x):
        return self.enc_out(self.encoder(x))

    def __call__(self, x):
        z = self.encode(x)
        x_hat = self.dec_out(self.decoder(z))
        return z, x_hat, self.ct_head(z), self.batch_head(z), self.cycle_head(z)


class JAEWrapper(BaseRegressionMethod):
    """JAE wrapper (parity: jae.py:31)."""

    _DISPLAY_ATTRS = ("z_dim",)

    def __init__(self, args=None, z_dim: int = 32, seed: int = 0):
        self.z_dim = z_dim
        self.seed = seed
        self.params = None

    @staticmethod
    def preprocessing_pipeline(log_level: LogLevel = "INFO"):
        return SetConfig({"feature_mod": ["mod1", "mod2"],
                          "feature_channel": [None, None],
                          "feature_channel_type": ["X", "X"],
                          "label_mod": "mod1", "label_channel": "cell_type",
                          "label_channel_type": "obs"}, log_level=log_level)

    @partial(jax.jit, static_argnames=("self", "has_labels"))
    def _step(self, params, opt_state, x, ct, batch, has_labels):
        def loss_fn(params):
            z, x_hat, ct_logits, b_logits, _ = self.net.apply({"params": params}, x)
            recon = jnp.mean((x_hat - x) ** 2)
            loss = recon
            if has_labels:
                ct_loss = optax.softmax_cross_entropy_with_integer_labels(
                    ct_logits, ct).mean()
                loss = loss + 0.1 * ct_loss
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = self._tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def fit(self, x_mod1, x_mod2, cell_type=None, batch_label=None,
            epochs: int = 200, lr: float = 1e-3):
        x = jnp.asarray(np.concatenate([as_numpy(x_mod1), as_numpy(x_mod2)], axis=1),
                        jnp.float32)
        has_labels = cell_type is not None
        if has_labels:
            ct_names, ct = np.unique(as_numpy(cell_type), return_inverse=True)
            n_ct = len(ct_names)
        else:
            ct, n_ct = np.zeros(len(x), np.int32), 0
        self.net = _JAE(in_dim=x.shape[1], z_dim=self.z_dim, n_cell_types=n_ct)
        key = jax.random.key(self.seed)
        self.params = self.net.init(key, x[:1])["params"]
        self._tx = optax.adam(lr)
        opt_state = self._tx.init(self.params)
        ctj = jnp.asarray(ct, jnp.int32)
        bj = jnp.zeros(len(x), jnp.int32)
        for epoch in range(epochs):
            self.params, opt_state, loss = self._step(self.params, opt_state, x, ctj,
                                                      bj, has_labels)
            if epoch % 50 == 0:
                logger.info("JAE epoch %d, loss %.5f", epoch, float(loss))
        self._x = x
        return self

    def predict(self, x_mod1=None, x_mod2=None):
        if x_mod1 is not None:
            x = jnp.asarray(np.concatenate([as_numpy(x_mod1), as_numpy(x_mod2)],
                                           axis=1), jnp.float32)
        else:
            x = self._x
        return np.asarray(self.net.apply({"params": self.params}, x,
                                         method=self.net.encode))

    def score(self, x, y, *, score_func=None, return_pred: bool = False,
              metric: str = "clustering", batch=None, **kwargs):
        """Joint-embedding quality. ``metric='clustering'`` reproduces the
        reference's KMeans NMI/ARI (labeled_clustering_evaluate); 'openproblems'
        runs the full first-party scIB suite (utils.scib_metrics)."""
        from dance_tpu.utils.metrics import (integration_openproblems_evaluate,
                                             labeled_clustering_evaluate)
        emb = self.predict()
        y = as_numpy(y)
        if metric == "openproblems":
            scores = integration_openproblems_evaluate(emb, y, batch, **kwargs)
            return (scores, emb) if return_pred else scores["final_scores"]
        scores = labeled_clustering_evaluate(emb, y, n_clusters=len(np.unique(y)))
        return (scores, emb) if return_pred else scores["dance_nmi"]


# reference inner-model alias
JAE = _JAE

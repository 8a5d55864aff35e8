"""JAE: joint autoencoder with a STRUCTURED latent (parity: jae.py:31-330).

The reference's trick: the latent code's leading dimensions ARE the auxiliary
predictions — ``z[:, :n_cell_types]`` are the cell-type logits, the next
``n_batches`` dims the batch logits (trained toward UNIFORM — an adversarial
batch-removal term, jae.py:25-28), then two cell-cycle phase dims; the rest is
free capacity. Encoder is 3×(Dense→GELU→BatchNorm→Dropout 0.2)→Dense(61);
decoder Dense(150)→ReLU→Dense(in)→ReLU. Loss = 0.7·MSE(recon) + 0.2·CE(cell
type) + 0.05·uniform-batch + 0.05·MSE(phase), Adam lr 1e-4 (jae.py:86-130).
Batch statistics are computed per call — exact for full-batch use.
"""

from functools import partial
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from dance_tpu.modules.base import BaseRegressionMethod
from dance_tpu.settings import logger
from dance_tpu.transforms import SetConfig
from dance_tpu.typing import LogLevel, Optional
from dance_tpu.utils.batch import epoch_batches
from dance_tpu.utils.wrappers import as_numpy


class _FullBatchNorm(nn.Module):
    @nn.compact
    def __call__(self, x):
        mean, var = x.mean(0), x.var(0)
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        return (x - mean) / jnp.sqrt(var + 1e-5) * scale + bias


class _JAE(nn.Module):
    in_dim: int
    z_dim: int = 61
    n_cell_types: int = 0
    n_batches: int = 0
    n_phases: int = 2
    hidden: Tuple[int, ...] = (150, 120, 100)
    dropout: float = 0.2

    def setup(self):
        self.enc_layers = [nn.Dense(d) for d in self.hidden]
        self.enc_norms = [_FullBatchNorm() for _ in self.hidden]
        self.enc_out = nn.Dense(self.z_dim)
        self.dec1 = nn.Dense(self.hidden[0])
        self.dec2 = nn.Dense(self.in_dim)

    def encode(self, x, *, training: bool = False, rng=None):
        for i, (lin, norm) in enumerate(zip(self.enc_layers, self.enc_norms)):
            x = norm(nn.gelu(lin(x)))
            if training and rng is not None and self.dropout > 0:
                keep = jax.random.bernoulli(jax.random.fold_in(rng, i),
                                            1 - self.dropout, x.shape)
                x = jnp.where(keep, x / (1 - self.dropout), 0.0)
        return self.enc_out(x)

    def __call__(self, x, *, training: bool = False, rng=None):
        z = self.encode(x, training=training, rng=rng)
        x_hat = nn.relu(self.dec2(nn.relu(self.dec1(z))))
        ct = z[:, :self.n_cell_types]
        b = z[:, self.n_cell_types:self.n_cell_types + self.n_batches]
        ph = z[:, self.n_cell_types + self.n_batches:
               self.n_cell_types + self.n_batches + self.n_phases]
        return z, x_hat, ct, b, ph


class JAEWrapper(BaseRegressionMethod):
    """JAE wrapper (parity: jae.py:31)."""

    _DISPLAY_ATTRS = ("z_dim",)

    def __init__(self, args=None, z_dim: int = 61, seed: int = 0):
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

    @partial(jax.jit, static_argnames=("self", "has_labels", "batch_size"))
    def _train_epoch(self, params, opt_state, x, ct, batch, phase, key,
                     has_labels: bool, batch_size: int):
        idx = epoch_batches(key, x.shape[0], batch_size)

        def loss_fn(params, bx, bct, bb, bph, rng):
            _, x_hat, ct_logits, b_logits, ph_pred = self.net.apply(
                {"params": params}, bx, training=True, rng=rng)
            loss = 0.7 * jnp.mean((x_hat - bx) ** 2)
            if has_labels:
                loss = loss + 0.2 * optax.softmax_cross_entropy_with_integer_labels(
                    ct_logits, bct).mean()
            if b_logits.shape[1] > 1:
                # adversarial batch removal: push toward uniform (jae.py:25)
                logp = jax.nn.log_softmax(b_logits, -1)
                loss = loss + 0.05 * (-logp.mean(-1)).mean()
            if ph_pred.shape[1]:
                loss = loss + 0.05 * jnp.mean((ph_pred - bph) ** 2)
            return loss

        def step(carry, batch_idx):
            params, opt_state, key = carry
            key, rng = jax.random.split(key)
            args = (x[batch_idx], ct[batch_idx], batch[batch_idx],
                    phase[batch_idx], rng)
            loss, grads = jax.value_and_grad(loss_fn)(params, *args)
            updates, opt_state = self._tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state, key), loss

        (params, opt_state, _), losses = jax.lax.scan(
            step, (params, opt_state, jax.random.fold_in(key, 1)), idx)
        return params, opt_state, losses.mean()

    def fit(self, x_mod1, x_mod2, cell_type=None, batch_label=None,
            phase_score=None, epochs: int = 200, lr: float = 1e-4,
            batch_size: int = 64):
        from dance_tpu.utils.wrappers import as_device
        # device-side concat: pre-uploaded inputs never round-trip the host
        x = jnp.concatenate([as_device(x_mod1, jnp.float32),
                             as_device(x_mod2, jnp.float32)], axis=1)
        n = x.shape[0]
        has_labels = cell_type is not None
        if has_labels:
            ct_names, ct = np.unique(as_numpy(cell_type), return_inverse=True)
            n_ct = len(ct_names)
        else:
            ct, n_ct = np.zeros(n, np.int32), 0
        if batch_label is not None:
            _, b = np.unique(as_numpy(batch_label), return_inverse=True)
            n_b = int(b.max()) + 1
        else:
            b, n_b = np.zeros(n, np.int32), 0
        phase = (as_numpy(phase_score).astype(np.float32)
                 if phase_score is not None else np.zeros((n, 2), np.float32))

        self.net = _JAE(in_dim=x.shape[1], z_dim=self.z_dim, n_cell_types=n_ct,
                        n_batches=n_b, n_phases=phase.shape[1])
        key = jax.random.key(self.seed)
        self.params = self.net.init(key, x[:2])["params"]
        self._tx = optax.adam(lr)
        opt_state = self._tx.init(self.params)
        ctj = jnp.asarray(ct, jnp.int32)
        bj = jnp.asarray(b, jnp.int32)
        phasej = jnp.asarray(phase)
        # all epochs in one compiled scan — a per-epoch dispatch costs two
        # host round trips over the axon relay (~170 ms/epoch measured)
        keys = jax.random.split(key, epochs)
        self.params, opt_state, losses = self._train_epochs(
            self.params, opt_state, x, ctj, bj, phasej, keys, has_labels,
            min(batch_size, n))
        for epoch in range(0, epochs, 50):
            logger.info("JAE epoch %d, loss %.5f", epoch, float(losses[epoch]))
        self._x = x
        return self

    @partial(jax.jit, static_argnames=("self", "has_labels", "batch_size"))
    def _train_epochs(self, params, opt_state, x, ct, batch, phase, keys,
                      has_labels: bool, batch_size: int):
        def epoch(carry, key):
            params, opt_state = carry
            params, opt_state, loss = self._train_epoch(
                params, opt_state, x, ct, batch, phase, key, has_labels,
                batch_size)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(epoch, (params, opt_state),
                                                   keys)
        return params, opt_state, losses

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


def random_classification_loss(y_pred, nb_batches):
    """Cross-entropy against the uniform batch distribution — the JAE batch
    adversary target (parity: jae.py:25)."""
    n = np.asarray(nb_batches).shape[0]
    y_true = jnp.full(jnp.asarray(y_pred).shape, 1.0 / n)
    return (-(jnp.log(jax.nn.softmax(jnp.asarray(y_pred), -1) + 1e-7))
            * y_true).sum(-1).mean()

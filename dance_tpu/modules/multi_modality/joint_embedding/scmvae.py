"""scMVAE: product-of-experts multimodal VAE for joint embedding.

Parity target: dance/modules/multi_modality/joint_embedding/scmvae.py (PoE
posterior :844 combining the two modality encoders' Gaussians, joint decoders).
"""

from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from dance_tpu.modules.base import BaseRegressionMethod
from dance_tpu.nn.vae import (GaussianDecoder, GaussianEncoder, gaussian_kl,
                              reparameterize)
from dance_tpu.settings import logger
from dance_tpu.typing import LogLevel, Optional
from dance_tpu.utils.wrappers import as_numpy


def product_of_experts(mu1, lv1, mu2, lv2):
    """PoE of two diagonal Gaussians + the standard-normal prior expert
    (parity: scmvae.py:844)."""
    prec1, prec2 = jnp.exp(-lv1), jnp.exp(-lv2)
    prec = 1.0 + prec1 + prec2  # prior has precision 1
    mu = (mu1 * prec1 + mu2 * prec2) / prec
    return mu, -jnp.log(prec)


class _scMVAENet(nn.Module):
    dim1: int
    dim2: int
    z_dim: int = 16

    def setup(self):
        self.enc1 = GaussianEncoder((128,), self.z_dim)
        self.enc2 = GaussianEncoder((128,), self.z_dim)
        self.dec1 = GaussianDecoder((128,), self.dim1)
        self.dec2 = GaussianDecoder((128,), self.dim2)

    def posterior(self, x1, x2):
        mu1, lv1 = self.enc1(x1)
        mu2, lv2 = self.enc2(x2)
        return product_of_experts(mu1, lv1, mu2, lv2)

    def __call__(self, x1, x2, rng):
        mu, lv = self.posterior(x1, x2)
        z = reparameterize(rng, mu, lv)
        return self.dec1(z), self.dec2(z), mu, lv

    def embed(self, x1, x2):
        mu, _ = self.posterior(x1, x2)
        return mu


class scMVAE(BaseRegressionMethod):
    """scMVAE model (parity: scmvae.py:282)."""

    _DISPLAY_ATTRS = ("z_dim",)

    def __init__(self, encoder_1=None, hidden_1=None, Z_DIMS: int = 16, *args,
                 z_dim: Optional[int] = None, seed: int = 0, **kwargs):
        self.z_dim = z_dim or Z_DIMS
        self.seed = seed
        self.params = None

    @staticmethod
    def preprocessing_pipeline(log_level: LogLevel = "INFO"):
        from dance_tpu.transforms import SetConfig
        return SetConfig({"feature_mod": ["mod1", "mod2"],
                          "feature_channel": [None, None],
                          "feature_channel_type": ["X", "X"],
                          "label_mod": "mod1", "label_channel": "cell_type",
                          "label_channel_type": "obs"}, log_level=log_level)

    @partial(jax.jit, static_argnames=("self",))
    def _step(self, params, opt_state, x1, x2, key):
        def loss_fn(params):
            r1, r2, mu, lv = self.net.apply({"params": params}, x1, x2, key)
            recon = jnp.mean((r1 - x1) ** 2) + jnp.mean((r2 - x2) ** 2)
            return recon + 1e-3 * gaussian_kl(mu, lv)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = self._tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def fit(self, x_mod1, x_mod2, epochs: int = 200, lr: float = 1e-3):
        x1 = jnp.asarray(as_numpy(x_mod1), jnp.float32)
        x2 = jnp.asarray(as_numpy(x_mod2), jnp.float32)
        self.net = _scMVAENet(dim1=x1.shape[1], dim2=x2.shape[1], z_dim=self.z_dim)
        key = jax.random.key(self.seed)
        self.params = self.net.init(key, x1[:1], x2[:1],
                                    jax.random.fold_in(key, 11))["params"]
        self._tx = optax.adam(lr)
        opt_state = self._tx.init(self.params)
        for epoch in range(epochs):
            key, sk = jax.random.split(key)
            self.params, opt_state, loss = self._step(self.params, opt_state, x1, x2,
                                                      sk)
            if epoch % 50 == 0:
                logger.info("scMVAE epoch %d, loss %.5f", epoch, float(loss))
        self._cache = (x1, x2)
        return self

    def predict(self, x_mod1=None, x_mod2=None):
        if x_mod1 is None:
            x1, x2 = self._cache
        else:
            x1 = jnp.asarray(as_numpy(x_mod1), jnp.float32)
            x2 = jnp.asarray(as_numpy(x_mod2), jnp.float32)
        return np.asarray(self.net.apply({"params": self.params}, x1, x2,
                                         method=self.net.embed))

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

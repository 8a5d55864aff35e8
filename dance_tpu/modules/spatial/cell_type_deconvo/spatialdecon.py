"""SpatialDecon: log-normal regression deconvolution (MSLE), jitted.

Parity target: dance/modules/spatial/cell_type_deconvo/spatialdecon.py (linear
map from cell-type profiles to spot expression trained with MSLE, nonnegative
weights via clamping, l1-normalized weights as proportions).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dance_tpu.modules.base import BaseRegressionMethod
from dance_tpu.settings import logger
from dance_tpu.transforms import CellTopicProfile, Compose, SetConfig
from dance_tpu.typing import Any, LogLevel, Optional
from dance_tpu.utils.metrics import resolve_score_func
from dance_tpu.utils.wrappers import as_numpy


def msle(pred, true):
    """Mean squared log error (parity: spatialdecon.py:25)."""
    return jnp.mean((jnp.log1p(pred) - jnp.log1p(true)) ** 2)


class SpatialDecon(BaseRegressionMethod):
    """SpatialDecon model (parity: spatialdecon.py:52)."""

    def __init__(self, ct_profile, ct_select, bias: bool = False, device: str = "auto"):
        self.ct_profile = jnp.asarray(as_numpy(ct_profile), jnp.float32)  # gene x ct
        self.ct_select = list(ct_select)
        self.bias = bias

    @staticmethod
    def preprocessing_pipeline(ct_select: str = "auto", ct_profile_split: str = "ref",
                               log_level: LogLevel = "INFO"):
        return Compose(
            CellTopicProfile(ct_select=ct_select, split_name=ct_profile_split),
            SetConfig({"label_channel": "cell_type_portion"}),
            log_level=log_level,
        )

    @partial(jax.jit, static_argnames=("self",))
    def _step(self, theta, opt_state, profile, mix):
        def loss_fn(theta):
            w, b = theta
            pred = profile @ jnp.maximum(w, 0.0).T  # gene x spots
            if self.bias:
                pred = pred + b[None, :]
            return msle(pred, mix)

        loss, grads = jax.value_and_grad(loss_fn)(theta)
        updates, opt_state = self._tx.update(grads, opt_state, theta)
        theta = optax.apply_updates(theta, updates)
        w, b = theta
        return (jnp.maximum(w, 0.0), b), opt_state, loss

    def fit(self, x, lr: float = 1e-4, max_iter: int = 500, print_period: int = 100):
        """x: spot expression (spots × genes)."""
        mix = jnp.asarray(as_numpy(x), jnp.float32).T  # gene x spots
        n_spots = mix.shape[1]
        k = len(self.ct_select)
        w = jnp.full((n_spots, k), 1.0 / k, jnp.float32)
        b = jnp.zeros(n_spots, jnp.float32)
        self._tx = optax.adam(lr)
        theta = (w, b)
        opt_state = self._tx.init(theta)
        for it in range(max_iter):
            theta, opt_state, loss = self._step(theta, opt_state, self.ct_profile, mix)
            if (it + 1) % print_period == 0:
                logger.info("Iter %d/%d MSLE %.5e", it + 1, max_iter, float(loss))
        self.weights = np.asarray(theta[0])
        return self

    def predict(self, x: Optional[Any] = None):
        w = np.maximum(self.weights, 0)
        return w / np.maximum(w.sum(1, keepdims=True), 1e-12)

    def score(self, x, y, *, score_func=None, return_pred: bool = False, **kwargs):
        y_pred = self.predict(x)
        func = resolve_score_func(score_func or "mse")
        s = func(as_numpy(y), y_pred)
        return (s, y_pred) if return_pred else s

    def fit_score(self, x, y, *, score_func=None, return_pred: bool = False,
                  **fit_kwargs):
        self.fit(x, **fit_kwargs)
        return self.score(None, y, score_func=score_func, return_pred=return_pred)


class MSLELoss:
    """Mean squared log error (parity: spatialdecon.py:25); callable like the
    reference's nn.Module: ``MSLELoss()(pred, true)``."""

    def __call__(self, pred, true):
        return float(msle(jnp.asarray(as_numpy(pred), jnp.float32),
                          jnp.asarray(as_numpy(true), jnp.float32)))

    forward = __call__

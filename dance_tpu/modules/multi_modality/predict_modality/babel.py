"""BABEL: paired autoencoders with cross-modal translation, TPU-native.

Parity target: dance/modules/multi_modality/predict_modality/babel.py (dual
encoder/decoder pairs trained on all four reconstruction/translation paths —
rna→rna, rna→mod2, mod2→mod2, mod2→rna — with NB likelihood on counts and MSE
on the second modality; the QuadLoss of dance/utils/loss.py:148-344).
"""

from functools import partial
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from dance_tpu.modules.base import BaseRegressionMethod
from dance_tpu.nn.vae import NBDecoder
from dance_tpu.nn.zinb_ae import MLPStack
from dance_tpu.settings import logger
from dance_tpu.utils.batch import epoch_batches
from dance_tpu.transforms import SetConfig
from dance_tpu.typing import LogLevel, Optional
from dance_tpu.utils.loss import nb_nll
from dance_tpu.utils.wrappers import as_numpy
from dance_tpu.parallel.mesh import to_device


class _Babel(nn.Module):
    dim1: int
    dim2: int
    hidden: int = 64

    def setup(self):
        self.enc1 = MLPStack((self.hidden * 2, self.hidden))
        self.enc2 = MLPStack((self.hidden * 2, self.hidden))
        self.dec1 = NBDecoder((self.hidden,), self.dim1)
        self.dec2_stack = MLPStack((self.hidden,))
        self.dec2_out = nn.Dense(self.dim2)

    def encode1(self, x1):
        return self.enc1(x1)

    def encode2(self, x2):
        return self.enc2(x2)

    def dec2(self, z):
        return self.dec2_out(self.dec2_stack(z))

    def __call__(self, x1, x2, lib1):
        # encoders see log-scaled counts for conditioning; NB decodes raw scale
        z1 = self.encode1(jnp.log1p(x1))
        z2 = self.encode2(x2)
        out = {}
        out["11"] = self.dec1(z1, lib1)
        out["21"] = self.dec1(z2, lib1)
        out["12"] = self.dec2(z1)
        out["22"] = self.dec2(z2)
        return out, z1, z2


class BabelWrapper(BaseRegressionMethod):
    """BABEL model (parity: babel.py:702)."""

    _DISPLAY_ATTRS = ("hidden",)

    def __init__(self, args=None, dim_in: int = 0, dim_out: int = 0, hidden: int = 64,
                 device: str = "auto", seed: int = 0):
        self.dim_in = dim_in
        self.dim_out = dim_out
        self.hidden = hidden
        self.seed = seed
        self.net = _Babel(dim1=dim_in, dim2=dim_out, hidden=hidden)
        self.params = None

    @staticmethod
    def preprocessing_pipeline(log_level: LogLevel = "INFO"):
        return SetConfig({"feature_mod": "mod1", "label_mod": "mod2",
                          "feature_channel": None, "feature_channel_type": "X",
                          "label_channel": None, "label_channel_type": "X"},
                         log_level=log_level)

    @partial(jax.jit, static_argnames=("self", "batch_size"))
    def _train_epoch(self, params, opt_state, x1, x2, lib1, key, batch_size: int):
        n = x1.shape[0]
        # full pass incl. partial batch (reference DataLoader drop_last=False)
        idx = epoch_batches(key, n, batch_size)
        # lib1 is (n, 1) (keepdims sum in fit); idx keeps the trailing axis,
        # so per-step lib is (bs, 1) — an extra [..., None] here once made it
        # (bs, 1, 1), broadcasting the NB mean to (bs, bs, genes): every
        # cell scaled by every other cell's library, a 512x compute blowup
        b1, b2, bl = x1[idx], x2[idx], lib1[idx]

        def loss_fn(params, bx1, bx2, blib):
            out, z1, z2 = self.net.apply({"params": params}, bx1, bx2, blib)
            l11 = nb_nll(bx1, *out["11"])
            l21 = nb_nll(bx1, *out["21"])
            l12 = jnp.mean((out["12"] - bx2) ** 2)
            l22 = jnp.mean((out["22"] - bx2) ** 2)
            latent = jnp.mean((z1 - z2) ** 2)
            return l11 + l21 + l12 + l22 + 0.1 * latent

        def step(carry, batch):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(params, *batch)
            updates, opt_state = self._tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), loss

        (params, opt_state), losses = jax.lax.scan(step, (params, opt_state),
                                                   (b1, b2, bl))
        return params, opt_state, losses.mean()

    @partial(jax.jit, static_argnames=("self", "n_valid"))
    def _val_rmse(self, params, xv1, xv2, n_valid: int):
        """Validation RMSE on device (rows past ``n_valid`` are dp wrap-pad)."""
        z1 = self.net.apply({"params": params}, jnp.log1p(xv1),
                            method=self.net.encode1)
        pred = self.net.apply({"params": params}, z1, method=self.net.dec2)
        return jnp.sqrt(((pred[:n_valid] - xv2[:n_valid]) ** 2).mean())

    @partial(jax.jit, static_argnames=("self", "batch_size"))
    def _train_epochs(self, params, opt_state, x1, x2, lib1, keys,
                      batch_size: int):
        """All epochs in one compiled scan (no-validation path) — a
        per-epoch dispatch costs two host round trips over the axon relay
        (~170 ms/epoch measured at 10k cells)."""
        def epoch(carry, key):
            params, opt_state = carry
            params, opt_state, loss = self._train_epoch(
                params, opt_state, x1, x2, lib1, key, batch_size)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(epoch, (params, opt_state),
                                                   keys)
        return params, opt_state, losses

    @partial(jax.jit, static_argnames=("self", "batch_size", "earlystop",
                                       "n_valid"))
    def _train_epochs_val(self, params, opt_state, x1, x2, lib1, xv1, xv2,
                          keys, batch_size: int, earlystop: int, n_valid: int):
        """Validation-selected training as ONE dispatch: per-epoch val RMSE,
        best-params snapshot and the reference's early-stop rule ("global
        best is older than `earlystop` epochs", babel.py:815-860) all run on
        device inside a lax.while_loop — the prior per-epoch Python loop paid
        a dispatch plus a scalar pull per epoch over the axon relay."""
        epochs = keys.shape[0]
        carry0 = dict(params=params, opt=opt_state, epoch=jnp.int32(0),
                      stop=jnp.bool_(False), best_val=jnp.float32(jnp.inf),
                      best_epoch=jnp.int32(0), best_params=params,
                      vals=jnp.full((epochs,), jnp.nan, jnp.float32),
                      loss=jnp.float32(0))

        def cond(c):
            return (c["epoch"] < epochs) & (~c["stop"])

        def body(c):
            e = c["epoch"]
            params, opt, loss = self._train_epoch(c["params"], c["opt"], x1,
                                                  x2, lib1, keys[e],
                                                  batch_size)
            val = self._val_rmse(params, xv1, xv2, n_valid)
            better = val < c["best_val"]
            pick = lambda new, old: jax.tree_util.tree_map(
                lambda a, b: jnp.where(better, a, b), new, old)
            best_epoch = jnp.where(better, e, c["best_epoch"])
            stop = (e > earlystop) & (e - best_epoch >= earlystop)
            return dict(params=params, opt=opt, epoch=e + 1, stop=stop,
                        best_val=jnp.minimum(val, c["best_val"]),
                        best_epoch=best_epoch,
                        best_params=pick(params, c["best_params"]),
                        vals=c["vals"].at[e].set(val), loss=loss)

        c = jax.lax.while_loop(cond, body, carry0)
        return (c["best_params"], c["opt"], c["vals"], c["best_val"],
                c["best_epoch"], c["epoch"], c["loss"])

    def fit(self, x_train, y_train, val_ratio: float = 0.15, epochs: int = 100,
            lr: float = 1e-3, batch_size: int = 64, earlystop: int = 20):
        """``val_ratio`` holds out cells whose cross-modal prediction RMSE
        selects the best parameters and early-stops past ``earlystop``
        non-improving epochs (parity: babel.py:815-860); set to 0 to train
        on everything with no selection."""
        x1_all = as_numpy(x_train).astype(np.float32)
        x2_all = as_numpy(y_train).astype(np.float32)
        n = x1_all.shape[0]
        n_val = int(n * val_ratio) if n > 20 else 0
        rng = np.random.default_rng(self.seed)
        perm = rng.permutation(n)
        tr, va = perm[:n - n_val or None], perm[n - n_val:] if n_val else []
        # device inputs cached across fits by content hash (the ~80 MB
        # re-upload per fit dwarfs the per-epoch training cost on the relay)
        import hashlib
        h = hashlib.md5(np.ascontiguousarray(x1_all))
        h.update(np.ascontiguousarray(x2_all))
        cache_key = (x1_all.shape, x2_all.shape, val_ratio, self.seed,
                     h.hexdigest())
        if getattr(self, "_fit_cache_key", None) == cache_key:
            x1, x2, xv1, xv2 = self._fit_cache
        else:
            x1 = to_device(x1_all[tr], jnp.float32)
            x2 = to_device(x2_all[tr], jnp.float32)
            xv1 = to_device(x1_all[va], jnp.float32) if n_val else None
            xv2 = to_device(x2_all[va], jnp.float32) if n_val else None
            self._fit_cache_key = cache_key
            self._fit_cache = (x1, x2, xv1, xv2)
        lib1 = x1.sum(1, keepdims=True)
        if self.params is None:
            self.net = _Babel(dim1=x1.shape[1], dim2=x2.shape[1], hidden=self.hidden)
            self.params = self.net.init(jax.random.key(self.seed), x1[:1], x2[:1],
                                        lib1[:1])["params"]
        self._tx = optax.adam(lr)
        opt_state = self._tx.init(self.params)
        key = jax.random.key(self.seed)
        bs = min(batch_size, x1.shape[0])
        if n_val:
            n_valid = len(va)
        if not n_val:
            keys = jax.random.split(key, epochs)
            self.params, opt_state, losses = self._train_epochs(
                self.params, opt_state, x1, x2, lib1, keys, bs)
            for epoch in range(0, epochs, 20):
                logger.info("BABEL epoch %d, loss %.5f", epoch,
                            float(losses[epoch]))
            return self
        epoch_keys = jax.random.split(key, epochs)
        (self.params, opt_state, vals, best_val, best_epoch, ran,
         loss) = self._train_epochs_val(self.params, opt_state, x1, x2, lib1,
                                        xv1, xv2, epoch_keys, bs, earlystop,
                                        n_valid)
        ran = int(ran)
        if ran < epochs:
            logger.info("BABEL early stopped at epoch %d (val RMSE %.5f)",
                        ran - 1, float(best_val))
        logger.info("BABEL best val RMSE %.5f at epoch %d (%d epochs run, "
                    "final loss %.5f)", float(best_val), int(best_epoch), ran,
                    float(loss))
        return self

    def predict(self, x):
        x1 = jnp.log1p(jnp.asarray(as_numpy(x), jnp.float32))
        z1 = self.net.apply({"params": self.params}, x1, method=self.net.encode1)
        return np.asarray(self.net.apply({"params": self.params}, z1,
                                         method=self.net.dec2))

    def score(self, x, y, *, score_func=None, return_pred: bool = False, **kwargs):
        from dance_tpu.utils.metrics import resolve_score_func
        pred = self.predict(x)
        func = resolve_score_func(score_func or "rmse")
        s = func(as_numpy(y), pred)
        return (s, pred) if return_pred else s


class Exp:
    """Clamped elementwise exp activation (parity: babel.py:38, values from
    DCA); callable on jnp arrays."""

    def __init__(self, minimum: float = 1e-5, maximum: float = 1e6):
        self.min_value = minimum
        self.max_value = maximum

    def __call__(self, x):
        return jnp.clip(jnp.exp(jnp.asarray(x)), self.min_value, self.max_value)

    forward = __call__


class ClippedSoftplus:
    """Clamped softplus activation (parity: babel.py:55)."""

    def __init__(self, beta: float = 1, threshold: float = 20,
                 minimum: float = 1e-4, maximum: float = 1e3):
        self.beta = beta
        self.threshold = threshold
        self.min_value = minimum
        self.max_value = maximum

    def __call__(self, x):
        x = jnp.asarray(x)
        sp_val = jnp.where(self.beta * x > self.threshold, x,
                           jax.nn.softplus(self.beta * x) / self.beta)
        return jnp.clip(sp_val, self.min_value, self.max_value)

    forward = __call__


def recursive_to_device(t, device=None):
    """Move a (possibly nested) array structure to device
    (parity: babel.py recursive_to_device; jax.device_put over pytrees)."""
    return jax.device_put(t, device)

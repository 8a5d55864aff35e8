"""CMAE: cross-modal autoencoder with adversarial latent alignment.

Parity target: dance/modules/multi_modality/predict_modality/cmae.py (paired
AEs whose latents are aligned; reconstruction + cross-translation + cycle
consistency + a latent discriminator). The GAN game runs as alternating jitted
steps on the shared (generator, discriminator) param pytrees.
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
from dance_tpu.parallel.mesh import to_device


class _CMAENet(nn.Module):
    dim1: int
    dim2: int
    z_dim: int = 32
    hidden: int = 128

    def setup(self):
        self.enc1 = MLPStack((self.hidden,))
        self.enc1_out = nn.Dense(self.z_dim)
        self.enc2 = MLPStack((self.hidden,))
        self.enc2_out = nn.Dense(self.z_dim)
        self.dec1 = MLPStack((self.hidden,))
        self.dec1_out = nn.Dense(self.dim1)
        self.dec2 = MLPStack((self.hidden,))
        self.dec2_out = nn.Dense(self.dim2)

    def encode1(self, x):
        return self.enc1_out(self.enc1(x))

    def encode2(self, x):
        return self.enc2_out(self.enc2(x))

    def decode1(self, z):
        return self.dec1_out(self.dec1(z))

    def decode2(self, z):
        return self.dec2_out(self.dec2(z))

    def __call__(self, x1, x2):
        z1, z2 = self.encode1(x1), self.encode2(x2)
        return (self.decode1(z1), self.decode2(z2), self.decode2(z1),
                self.decode1(z2), z1, z2)


class _Disc(nn.Module):
    hidden: int = 64

    @nn.compact
    def __call__(self, z):
        h = nn.relu(nn.Dense(self.hidden)(z))
        return nn.Dense(1)(h).squeeze(-1)


class CMAE(BaseRegressionMethod):
    """CMAE model (parity: cmae.py:255)."""

    _DISPLAY_ATTRS = ("z_dim", "hidden")

    def __init__(self, hyperparameters=None, dim1: int = 0, dim2: int = 0,
                 z_dim: int = 32, hidden: int = 128, seed: int = 0):
        self.hyper = hyperparameters or {}
        self.z_dim = z_dim
        self.hidden = hidden
        self.seed = seed
        self.params = None
        # reference weight names map onto the jnp loss terms
        # (recon_x_w -> recon, gan_w -> adv, super_w -> align; cmae.py:422-429)
        self.loss_weights = {
            "recon": float(self.hyper.get("recon_x_w", 1.0)),
            "trans": float(self.hyper.get("trans_w", 1.0)),
            "adv": float(self.hyper.get("gan_w", 0.1)),
            "align": float(self.hyper.get("super_w", 0.5)),
        }

    @staticmethod
    def preprocessing_pipeline(log_level: LogLevel = "INFO"):
        return SetConfig({"feature_mod": "mod1", "label_mod": "mod2",
                          "feature_channel": None, "feature_channel_type": "X",
                          "label_channel": None, "label_channel_type": "X"},
                         log_level=log_level)

    @partial(jax.jit, static_argnames=("self",))
    def _gen_step(self, g_params, d_params, opt_state, x1, x2):
        w = self.loss_weights

        def loss_fn(g_params):
            r1, r2, t12, t21, z1, z2 = self.net.apply({"params": g_params}, x1, x2)
            recon = jnp.mean((r1 - x1) ** 2) + jnp.mean((r2 - x2) ** 2)
            trans = jnp.mean((t12 - x2) ** 2) + jnp.mean((t21 - x1) ** 2)
            # adversarial: z1 should fool discriminator into predicting "z2"
            d_out = self.disc.apply({"params": d_params}, z1)
            adv = optax.sigmoid_binary_cross_entropy(d_out, jnp.ones_like(d_out)).mean()
            align = jnp.mean((z1 - z2) ** 2)
            return (w["recon"] * recon + w["trans"] * trans + w["adv"] * adv
                    + w["align"] * align)

        loss, grads = jax.value_and_grad(loss_fn)(g_params)
        updates, opt_state = self._g_tx.update(grads, opt_state, g_params)
        return optax.apply_updates(g_params, updates), opt_state, loss

    @partial(jax.jit, static_argnames=("self",))
    def _disc_step(self, g_params, d_params, opt_state, x1, x2):
        def loss_fn(d_params):
            z1 = self.net.apply({"params": g_params}, x1, method=self.net.encode1)
            z2 = self.net.apply({"params": g_params}, x2, method=self.net.encode2)
            d1 = self.disc.apply({"params": d_params}, z1)
            d2 = self.disc.apply({"params": d_params}, z2)
            return (optax.sigmoid_binary_cross_entropy(d1, jnp.zeros_like(d1)).mean()
                    + optax.sigmoid_binary_cross_entropy(d2, jnp.ones_like(d2)).mean())

        loss, grads = jax.value_and_grad(loss_fn)(d_params)
        updates, opt_state = self._d_tx.update(grads, opt_state, d_params)
        return optax.apply_updates(d_params, updates), opt_state, loss

    @partial(jax.jit, static_argnames=("self", "batch_size"))
    def _train_epochs(self, g_params, d_params, g_state, d_state, x1, x2, keys,
                      batch_size: int):
        """All epochs in one compiled program: shuffled minibatch G/D updates
        (the reference iterates batch_size-sized loader batches per epoch,
        cmae.py:533-581 — one full-batch step per epoch trains 8-10x fewer
        optimizer steps and underfits)."""
        n = x1.shape[0]
        nb = max(n // batch_size, 1)

        def epoch(carry, key):
            g_params, d_params, g_state, d_state = carry
            perm = jax.random.permutation(key, n)[:nb * batch_size]
            b1 = x1[perm].reshape(nb, batch_size, -1)
            b2 = x2[perm].reshape(nb, batch_size, -1)

            def step(carry, batch):
                g_params, d_params, g_state, d_state = carry
                bx1, bx2 = batch
                d_params, d_state, d_loss = self._disc_step(
                    g_params, d_params, d_state, bx1, bx2)
                g_params, g_state, g_loss = self._gen_step(
                    g_params, d_params, g_state, bx1, bx2)
                return (g_params, d_params, g_state, d_state), (g_loss, d_loss)

            carry, losses = jax.lax.scan(step, (g_params, d_params, g_state,
                                                d_state), (b1, b2))
            return carry, (losses[0].mean(), losses[1].mean())

        (g_params, d_params, g_state, d_state), hist = jax.lax.scan(
            epoch, (g_params, d_params, g_state, d_state), keys)
        return g_params, d_params, g_state, d_state, hist

    def fit(self, x_train, y_train, epochs: int = 200, lr: float = 1e-3,
            batch_size: int = 64,
            checkpoint_directory: Optional[str] = None):
        x1 = to_device(x_train, jnp.float32)
        x2 = to_device(y_train, jnp.float32)
        self.net = _CMAENet(dim1=x1.shape[1], dim2=x2.shape[1], z_dim=self.z_dim,
                            hidden=self.hidden)
        self.disc = _Disc()
        key = jax.random.key(self.seed)
        self.params = self.net.init(key, x1[:1], x2[:1])["params"]
        d_params = self.disc.init(jax.random.fold_in(key, 1),
                                  jnp.zeros((1, self.z_dim)))["params"]
        self._g_tx = optax.adam(lr)
        self._d_tx = optax.adam(lr)
        g_state = self._g_tx.init(self.params)
        d_state = self._d_tx.init(d_params)
        keys = jax.random.split(jax.random.fold_in(key, 7), epochs)
        self.params, d_params, g_state, d_state, hist = self._train_epochs(
            self.params, d_params, g_state, d_state, x1, x2, keys,
            min(batch_size, x1.shape[0]))
        g_hist, d_hist = np.asarray(hist[0]), np.asarray(hist[1])
        for epoch in range(0, epochs, 50):
            logger.info("CMAE epoch %d, G %.5f D %.5f", epoch,
                        float(g_hist[epoch]), float(d_hist[epoch]))
        if checkpoint_directory is not None:
            # the reference snapshots G/D states under the checkpoint dir
            # (cmae.py resume/save); one final-state snapshot here
            import os
            import pickle
            os.makedirs(checkpoint_directory, exist_ok=True)
            path = os.path.join(checkpoint_directory,
                                f"gen_{epochs:08d}.pt.pkl")
            with open(path, "wb") as fh:
                pickle.dump({"gen": jax.device_get(self.params),
                             "dis": jax.device_get(d_params)}, fh)
            logger.info("CMAE checkpoint written to %s", path)
        return self

    def predict(self, x):
        x1 = jnp.asarray(as_numpy(x), jnp.float32)
        z1 = self.net.apply({"params": self.params}, x1, method=self.net.encode1)
        return np.asarray(self.net.apply({"params": self.params}, z1,
                                         method=self.net.decode2))

    def encode(self, x, modality: int = 1):
        x = jnp.asarray(as_numpy(x), jnp.float32)
        method = self.net.encode1 if modality == 1 else self.net.encode2
        return np.asarray(self.net.apply({"params": self.params}, x, method=method))

    def score(self, x, y, *, score_func=None, return_pred: bool = False, **kwargs):
        from dance_tpu.utils.metrics import resolve_score_func
        pred = self.predict(x)
        func = resolve_score_func(score_func or "rmse")
        s = func(as_numpy(y), pred)
        return (s, pred) if return_pred else s


def get_model_list(dirname, key):
    """Latest checkpoint path containing ``key`` in ``dirname``
    (parity: cmae.py get_model_list)."""
    import os
    if not os.path.exists(dirname):
        return None
    # substring '.pt' match (reference semantics) so the framework's own
    # gen_XXXXXXXX.pt.pkl checkpoints are discoverable
    models = [os.path.join(dirname, f) for f in os.listdir(dirname)
              if os.path.isfile(os.path.join(dirname, f)) and key in f
              and ".pt" in f]
    if not models:
        return None
    return sorted(models)[-1]


def weights_init(init_type: str = "gaussian"):
    """Flax initializer by reference name (parity: cmae.py weights_init —
    the torch version mutates modules in place; flax passes initializers at
    construction, so this returns the matching kernel initializer)."""
    import flax.linen as fnn
    inits = {
        "gaussian": fnn.initializers.normal(0.02),
        "xavier": fnn.initializers.xavier_normal(),
        "kaiming": fnn.initializers.kaiming_normal(),
        "orthogonal": fnn.initializers.orthogonal(),
        "default": fnn.initializers.lecun_normal(),
    }
    if init_type not in inits:
        raise AssertionError(f"Unsupported initialization: {init_type}")
    return inits[init_type]


def get_scheduler(hyperparameters, iterations: int = -1):
    """optax LR schedule from the reference hyperparameter dict
    (parity: cmae.py get_scheduler — torch StepLR equivalent)."""
    import optax
    policy = hyperparameters.get("lr_policy")
    if policy is None or policy == "constant":
        return optax.constant_schedule(hyperparameters.get("lr", 1e-4))
    if policy == "step":
        return optax.exponential_decay(
            hyperparameters.get("lr", 1e-4),
            transition_steps=hyperparameters["step_size"],
            decay_rate=hyperparameters.get("gamma", 0.1), staircase=True)
    raise NotImplementedError(f"learning rate policy [{policy}] is not implemented")

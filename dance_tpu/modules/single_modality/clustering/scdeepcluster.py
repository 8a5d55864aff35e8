"""scDeepCluster: ZINB autoencoder + DEC soft clustering, TPU-native.

Parity target: dance/modules/single_modality/clustering/scdeepcluster.py
(denoising ZINB-AE pretrain, KMeans-initialized cluster centers, alternating
target-distribution updates and joint ZINB+KL minibatch training, ARI-based
epoch selection). Both stages run as jitted lax.scan epochs; KMeans init uses
the device KMeans from :mod:`dance_tpu.ops.cluster`.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dance_tpu.modules.base import BaseClusteringMethod, NNPretrain
from dance_tpu.nn.zinb_ae import ZINBAutoencoder
from dance_tpu.settings import logger
from dance_tpu.transforms import AnnDataTransform, Compose, SaveRaw, SetConfig
from dance_tpu.typing import LogLevel, Optional, Tuple
from dance_tpu.utils.batch import epoch_batches
from dance_tpu.utils.loss import cluster_kl_loss, soft_assign, target_distribution, zinb_nll
from dance_tpu.utils.wrappers import as_numpy
from dance_tpu.parallel.mesh import to_device


class ScDeepCluster(NNPretrain, BaseClusteringMethod):
    """scDeepCluster model (parity: scdeepcluster.py:63)."""

    _DISPLAY_ATTRS = ("z_dim", "sigma", "alpha", "gamma")

    def __init__(self, input_dim: int, z_dim: int, encodeLayer=(256, 64),
                 decodeLayer=(64, 256), activation: str = "relu", sigma: float = 1.0,
                 alpha: float = 1.0, gamma: float = 1.0, device: str = "auto",
                 pretrain_path: Optional[str] = None, seed: int = 0):
        super().__init__()
        self.input_dim = input_dim
        self.z_dim = z_dim
        self.sigma = sigma
        self.alpha = alpha
        self.gamma = gamma
        self.pretrain_path = pretrain_path
        self.seed = seed
        self.model = ZINBAutoencoder(input_dim=input_dim, z_dim=z_dim,
                                     encode_layers=tuple(encodeLayer),
                                     decode_layers=tuple(decodeLayer), sigma=sigma)
        self.params = None
        self.mu = None  # cluster centers

    @staticmethod
    def preprocessing_pipeline(log_level: LogLevel = "INFO"):
        return Compose(
            AnnDataTransform("sc.pp.filter_genes", min_counts=1),
            AnnDataTransform("sc.pp.filter_cells", min_counts=1),
            SaveRaw(),
            AnnDataTransform("sc.pp.normalize_total"),
            AnnDataTransform("sc.pp.log1p"),
            AnnDataTransform("sc.pp.scale"),
            SetConfig({"feature_channel": [None, None, "n_counts"],
                       "feature_channel_type": ["X", "raw_X", "obs"],
                       "label_channel": "Group"}),
            log_level=log_level,
        )

    # --- jitted stages ----------------------------------------------------

    def _pretrain_epoch_impl(self, params, opt_state, x, x_raw, sf, key,
                             batch_size: int):
        n = x.shape[0]
        idx = epoch_batches(key, n, batch_size)
        nb = idx.shape[0]
        data = (x[idx], x_raw[idx], sf[idx],
                jax.random.split(jax.random.fold_in(key, 1), nb))

        def loss_fn(params, bx, braw, bsf, rng):
            _, mean, disp, pi = self.model.apply({"params": params}, bx, noise_rng=rng)
            return zinb_nll(braw, mean, disp, pi, scale_factor=bsf[:, None])

        def step(carry, batch):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(params, *batch)
            updates, opt_state = self._pt_tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), loss

        (params, opt_state), losses = jax.lax.scan(step, (params, opt_state), data)
        return params, opt_state, losses.mean()

    @partial(jax.jit, static_argnames=("self", "batch_size"))
    def _pretrain_epoch(self, params, opt_state, x, x_raw, sf, key, batch_size: int):
        return self._pretrain_epoch_impl(params, opt_state, x, x_raw, sf, key,
                                         batch_size)

    @partial(jax.jit, static_argnames=("self", "batch_size", "epochs"))
    def _pretrain_run(self, params, opt_state, x, x_raw, sf, key, batch_size: int,
                      epochs: int):
        """All pretrain epochs as one compiled scan (one dispatch per fit)."""
        def body(carry, ek):
            params, opt_state = carry
            params, opt_state, loss = self._pretrain_epoch_impl(
                params, opt_state, x, x_raw, sf, ek, batch_size)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), jax.random.split(key, epochs))
        return params, opt_state, losses

    @partial(jax.jit, static_argnames=("self", "batch_size", "refresh", "n_true"))
    def _dec_epoch(self, params, mu, opt_state, x, x_raw, sf, p_in, prev_labels,
                   y_true, key, batch_size: int, refresh: bool, n_true: int):
        """One DEC epoch as ONE dispatch: (optional) target refresh from the
        pre-step params, then the full minibatch pass.  The tol check
        (label-change fraction) and the best-epoch ARI are computed on device
        too — the host pulls three scalars per epoch, never the q/z matrices
        (each pull is a relay round trip that costs more than the epoch's
        compute)."""
        from dance_tpu.utils.metrics import device_ari
        if refresh:
            latent = self.model.apply({"params": params}, x,
                                      method=self.model.encode)
            q = soft_assign(latent, mu, self.alpha)
            p = target_distribution(q)
            labels = q.argmax(1).astype(jnp.int32)
            delta = (labels != prev_labels).mean()
            ari_v = (device_ari(y_true, labels, n_true, int(mu.shape[0]))
                     if n_true else jnp.float32(0))
        else:
            latent = jnp.zeros((x.shape[0], 1), x.dtype)
            q, p = p_in, p_in
            labels = prev_labels
            delta = jnp.float32(0)
            ari_v = jnp.float32(0)
        params, mu, opt_state, loss = self._cluster_epoch_impl(
            params, mu, opt_state, x, x_raw, sf, p, key, batch_size)
        return (params, mu, opt_state, p, q, latent, labels, delta, ari_v,
                loss)

    def _cluster_epoch_impl(self, params, mu, opt_state, x, x_raw, sf, p, key,
                            batch_size: int):
        n = x.shape[0]
        idx = epoch_batches(jax.random.key(0), n, batch_size)  # fixed order, full pass
        data = (x[idx], x_raw[idx], sf[idx], p[idx],
                jax.random.split(key, idx.shape[0]))

        def loss_fn(theta, bx, braw, bsf, bp, rng):
            params, mu = theta
            # reference forward(): ZINB heads from the NOISY encoder path,
            # soft assignments from the clean embedding (scdeepcluster.py:222)
            z_clean, mean, disp, pi = self.model.apply({"params": params}, bx,
                                                       noise_rng=rng)
            q = soft_assign(z_clean, mu, self.alpha)
            return (self.gamma * cluster_kl_loss(bp, q)
                    + zinb_nll(braw, mean, disp, pi, scale_factor=bsf[:, None]))

        def step(carry, batch):
            theta, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(theta, *batch)
            updates, opt_state = self._cl_tx.update(grads, opt_state, theta)
            return (optax.apply_updates(theta, updates), opt_state), loss

        ((params, mu), opt_state), losses = jax.lax.scan(step, ((params, mu), opt_state),
                                                         data)
        return params, mu, opt_state, losses.mean()

    @partial(jax.jit, static_argnames=("self", "batch_size"))
    def _cluster_epoch(self, params, mu, opt_state, x, x_raw, sf, p, key,
                       batch_size: int):
        return self._cluster_epoch_impl(params, mu, opt_state, x, x_raw, sf, p,
                                        key, batch_size)

    @partial(jax.jit, static_argnames=("self",))
    def _encode(self, params, x):
        return self.model.apply({"params": params}, x, method=self.model.encode)

    # --- stages -----------------------------------------------------------

    def pretrain(self, x, x_raw, n_counts, batch_size: int = 256, lr: float = 0.001,
                 epochs: int = 400):
        x = to_device(x, jnp.float32)
        x_raw = to_device(x_raw, jnp.float32)
        sf = to_device(n_counts / np.median(np.asarray(n_counts)), jnp.float32)
        key = jax.random.key(self.seed)
        if self.params is None:
            self.params = self.model.init(jax.random.split(key)[0], x[:1])["params"]
        self._pt_tx = optax.amsgrad(lr)  # reference: Adam(amsgrad=True)
        opt_state = self._pt_tx.init(self.params)
        bs = min(batch_size, x.shape[0])
        key = jax.random.split(key)[1]
        self.params, opt_state, losses = self._pretrain_run(
            self.params, opt_state, x, x_raw, sf, key, bs, epochs)
        losses = np.asarray(losses)
        for epoch in range(0, epochs, 100):
            logger.info("Pretrain epoch %3d, ZINB loss: %.6f", epoch + 1,
                        losses[epoch])

    def fit(self, inputs: Tuple, y=None, n_clusters: int = 10, init_centroid=None,
            y_pred_init=None, lr: float = 1.0, batch_size: int = 256, epochs: int = 10,
            update_interval: int = 1, tol: float = 1e-3, pt_batch_size: int = 256,
            pt_lr: float = 0.001, pt_epochs: int = 400):
        x, x_raw, n_counts = (as_numpy(i) for i in inputs)
        self._pretrain(x, x_raw, n_counts, batch_size=pt_batch_size, lr=pt_lr,
                       epochs=pt_epochs, force_pretrain=True)

        x = to_device(x, jnp.float32)
        x_raw = to_device(x_raw, jnp.float32)
        sf = to_device(n_counts / np.median(n_counts), jnp.float32)

        if init_centroid is None:
            from dance_tpu.ops.cluster import kmeans
            latent = self._encode(self.params, x)
            res = kmeans(latent, n_clusters, n_init=20, seed=self.seed)
            self.mu = jnp.asarray(res.centers)
            self.y_pred = np.asarray(res.labels)
        else:
            self.mu = jnp.asarray(init_centroid, jnp.float32)
            self.y_pred = np.asarray(y_pred_init)

        try:
            self._cl_tx = optax.adadelta(lr, rho=0.95)
        except AttributeError:
            self._cl_tx = optax.adam(1e-3)
        opt_state = self._cl_tx.init((self.params, self.mu))

        bs = min(batch_size, x.shape[0])
        key = jax.random.fold_in(jax.random.key(self.seed), 13)
        labels_dev = jnp.asarray(self.y_pred, jnp.int32)
        if y is not None:
            y_arr = np.asarray(y).ravel()
            n_true = int(y_arr.max()) + 1
            y_dev = jnp.asarray(y_arr, jnp.int32)
        else:
            n_true = 0
            y_dev = jnp.zeros_like(labels_dev)
        # the WHOLE DEC protocol (refresh / tol stop / best-ARI snapshot)
        # runs as ONE dispatch — see nn/dec_loop.py
        from dance_tpu.nn.dec_loop import run_dec_loop
        (self.params, self.mu, opt_state), out = run_dec_loop(
            self._dec_refresh, self._dec_train,
            (self.params, self.mu, opt_state), dict(x=x, xr=x_raw, sf=sf),
            labels_dev, y_dev, key, epochs, tol, n_true=n_true, batch_size=bs,
            update_interval=update_interval, static_token=(float(lr),))
        if bool(out["stop"]):
            logger.info("Reach tolerance threshold (%.3e < %.3e) at epoch %d. "
                        "Stopped training.", float(out["delta"]), tol,
                        int(out["epoch"]))
        logger.info("Epoch %3d: loss %.6f", int(out["epoch"]),
                    float(out["loss"]))
        src = "best_" if n_true else ""
        self.q = np.asarray(out[f"{src}q"])
        self.z = np.asarray(out[f"{src}z"])
        self.y_pred = np.asarray(out[f"{src}labels"])
        return self

    def _dec_refresh(self, state, data):
        params, mu, _ = state
        latent = self.model.apply({"params": params}, data["x"],
                                  method=self.model.encode)
        q = soft_assign(latent, mu, self.alpha)
        return q, latent, target_distribution(q)

    def _dec_train(self, state, p, key, data, batch_size: int):
        params, mu, opt_state = state
        params, mu, opt_state, loss = self._cluster_epoch_impl(
            params, mu, opt_state, data["x"], data["xr"], data["sf"], p, key,
            batch_size)
        return (params, mu, opt_state), loss

    def predict_proba(self, x=None) -> np.ndarray:
        return np.asarray(self.q)

    def predict(self, x=None) -> np.ndarray:
        return np.asarray(self.q).argmax(1)

    def get_latent(self):
        return np.asarray(self.z)


def euclidean_dist(x, y):
    """Pairwise squared-difference sum (parity: scdeepcluster.py euclidean_dist)."""
    return jnp.sum(jnp.square(jnp.asarray(x) - jnp.asarray(y)))

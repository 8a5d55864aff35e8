"""scMVAE: product-of-experts multimodal VAE for joint embedding.

Parity target: dance/modules/multi_modality/joint_embedding/scmvae.py — the
PoE posterior combining per-modality Gaussian encoders with the spherical
prior expert (:844-873), library-size latents with dedicated encoders
(:335-360), a ZINB decoder for the count modality (softmax scale ×
exp(library), :189-220), a Bernoulli/Possion/Gaussian decoder for the second
modality (:246-279), the shared decode stack with the model-0/1/2 latent
split (:392-418), the GMM latent prior with learnable (pi, mu_c, var_c) and
an sklearn GaussianMixture warm start (:322-324, :555-592), and the training
loop with KL warmup + stepped lr decay + best-state tracking (:625-757).

Deviations (documented): the GMM mixture weights are parametrized as logits
and variances as log-variances (the reference's raw ``pi``/``var_c`` tensors
can go negative under Adam and NaN out through ``log``); the reference's
X2-ZINB library-KL bug (it passes the sampled library as the logvar,
scmvae.py:846) is not reproduced — the proper (mean_l2, logvar_l2) pair is
used; batch-norm in ``build_multi_layers`` is replaced by the plain
ReLU+dropout stack shared with DCCA.
"""

from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from dance_tpu.modules.base import BaseRegressionMethod
from dance_tpu.settings import logger
from dance_tpu.typing import LogLevel, Optional, Tuple
from dance_tpu.utils.batch import epoch_batches
from dance_tpu.utils.loss import zinb_nll
from dance_tpu.utils.wrappers import as_device, as_numpy


def product_of_experts(mus, logvars, eps: float = 1e-8):
    """PoE over stacked experts (first expert = N(0, I) prior)
    (parity: scmvae.py:844-873)."""
    var = jnp.exp(logvars) + eps
    precision = 1.0 / var
    mu = jnp.sum(mus * precision, axis=0) / jnp.sum(precision, axis=0)
    return mu, jnp.log(1.0 / jnp.sum(precision, axis=0))


def calculate_log_library_size(counts):
    """Scalar log-library mean/var broadcast per cell
    (parity: transforms/preprocess.py:89-102)."""
    t = np.maximum(np.asarray(counts).sum(1), 1e-7).astype(np.float64)
    lib = np.log(t)
    n = len(lib)
    return (np.full((n, 1), lib.mean(), np.float32),
            np.full((n, 1), lib.var(), np.float32))


def _bernoulli_nll(p, x):
    """Per-cell BCE (parity: scmvae.py:54-55)."""
    return -jnp.sum(x * jnp.log(p + 1e-8) + (1 - x) * jnp.log(1 - p + 1e-8),
                    axis=1)


def _poisson_nll(rate, x):
    """Per-cell Poisson NLL (parity: scmvae.py:110-117)."""
    return jnp.sum(rate - x * jnp.log(rate + 1e-10)
                   + jax.lax.lgamma(x + 1.0), axis=1)


def _masked_mse(pred, x):
    """Sign-masked squared error (parity: scmvae.py:99-108)."""
    return jnp.sum(((pred - x) * jnp.sign(x)) ** 2, axis=1)


def _normal_kl(mu1, logstd1_like, mu2, var2):
    """KL(N(mu1, s1)||N(mu2, s2)) with s1 = exp(logvar-as-logstd) — the
    reference feeds ``torch.exp(logvar_l)`` to Normal's *scale* argument
    (scmvae.py:836-840); matched exactly."""
    s1 = jnp.exp(logstd1_like)
    s2 = jnp.sqrt(var2)
    return jnp.sum(jnp.log(s2 / (s1 + 1e-12) + 1e-12)
                   + (s1 ** 2 + (mu1 - mu2) ** 2) / (2 * s2 ** 2) - 0.5,
                   axis=1)


class _MLP(nn.Module):
    dims: Tuple[int, ...]
    droprate: float = 0.1

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        for d in self.dims:
            x = nn.relu(nn.Dense(d)(x))
            x = nn.Dropout(self.droprate, deterministic=not training)(x)
        return x


class _GaussianHead(nn.Module):
    """Encoder stack -> (mu, logvar, sample) (parity: Encoder, scmvae.py:155)."""

    hidden: Tuple[int, ...]
    z_dim: int
    droprate: float = 0.1

    @nn.compact
    def __call__(self, x, rng=None, *, training: bool = False):
        h = _MLP(self.hidden, self.droprate)(x, training=training)
        mu = nn.Dense(self.z_dim)(h)
        logvar = nn.Dense(self.z_dim)(h)
        if training and rng is not None:
            z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mu.shape)
        else:
            z = mu
        return mu, logvar, z


class _ZINBDecoder(nn.Module):
    """softmax scale × exp(library) mean, exp dispersion, dropout logits
    (parity: DecoderZINB, scmvae.py:189-220)."""

    hidden: Tuple[int, ...]
    out_dim: int
    droprate: float = 0.1

    @nn.compact
    def __call__(self, z, library, *, training: bool = False):
        h = _MLP(self.hidden, self.droprate)(z, training=training) if self.hidden else z
        normalized = nn.softmax(nn.Dense(self.out_dim)(h), axis=1)
        mean = jnp.exp(library) * normalized
        disp = jnp.exp(jnp.clip(nn.Dense(self.out_dim)(h), -15, 15))
        dropout = nn.sigmoid(nn.Dense(self.out_dim)(h))
        return normalized, mean, disp, dropout


class _PlainDecoder(nn.Module):
    """Bernoulli/Gaussian/Possion head (parity: Decoder, scmvae.py:246-279)."""

    hidden: Tuple[int, ...]
    out_dim: int
    out_type: str = "Bernoulli"
    droprate: float = 0.1

    @nn.compact
    def __call__(self, z, *, training: bool = False):
        h = _MLP(self.hidden, self.droprate)(z, training=training) if self.hidden else z
        raw = nn.Dense(self.out_dim)(h)
        if self.out_type in ("Bernoulli", "Gaussian1"):
            return nn.sigmoid(raw)
        if self.out_type == "Gaussian":
            return nn.softmax(raw, axis=1)
        return nn.relu(raw)


class _scMVAENet(nn.Module):
    dim1: int
    dim2: int
    z_dim: int = 16
    hidden1: Tuple[int, ...] = (128,)
    hidden2: Tuple[int, ...] = (128,)
    hidden_l: Tuple[int, ...] = (128,)
    decoder_share: Tuple[int, ...] = (128, 256)
    share_hidden: int = 128
    dec1_hidden: Tuple[int, ...] = (128,)
    dec2_hidden: Tuple[int, ...] = (128,)
    type2: str = "Bernoulli"
    n_centroids: int = 19
    model: int = 2
    log_variational: bool = True
    droprate: float = 0.1

    def setup(self):
        self.enc1 = _GaussianHead(self.hidden1, self.z_dim, self.droprate)
        self.enc2 = _GaussianHead(self.hidden2, self.z_dim, self.droprate)
        self.enc_l1 = _GaussianHead(self.hidden_l, 1, self.droprate)
        self.share = _MLP(self.decoder_share, self.droprate)
        self.dec1 = _ZINBDecoder(self.dec1_hidden, self.dim1, self.droprate)
        if self.type2 == "ZINB":
            self.enc_l2 = _GaussianHead(self.hidden_l, 1, self.droprate)
            self.dec2 = _ZINBDecoder(self.dec2_hidden, self.dim2, self.droprate)
        else:
            self.dec2 = _PlainDecoder(self.dec2_hidden, self.dim2, self.type2,
                                      self.droprate)
        # GMM latent prior (parity: scmvae.py:322-324); logit/log-var
        # parametrization for positivity (see module docstring).
        self.pi_logit = self.param("pi_logit",
                                   nn.initializers.zeros, (self.n_centroids,))
        self.mu_c = self.param("mu_c", nn.initializers.zeros,
                               (self.z_dim, self.n_centroids))
        self.logvar_c = self.param("logvar_c", nn.initializers.zeros,
                                   (self.z_dim, self.n_centroids))

    def _prep(self, x):
        return jnp.log(jnp.clip(x, 1e-7, None) + 1) if self.log_variational else x

    def posterior(self, x1, x2, rng=None, *, training: bool = False):
        x1_, x2_ = self._prep(x1), self._prep(x2)
        r1 = r2 = None
        if rng is not None:
            r1, r2 = jax.random.split(rng)
        mu1, lv1, _ = self.enc1(x1_, r1, training=training)
        mu2, lv2, _ = self.enc2(x2_, r2, training=training)
        prior_mu = jnp.zeros_like(mu1)
        mus = jnp.stack([prior_mu, mu1, mu2])
        lvs = jnp.stack([jnp.zeros_like(lv1), lv1, lv2])
        return product_of_experts(mus, lvs)

    def __call__(self, x1, x2, rng=None, *, training: bool = False):
        x1_, x2_ = self._prep(x1), self._prep(x2)
        rz = rl1 = rl2 = None
        if rng is not None:
            rz, rl1, rl2 = jax.random.split(rng, 3)
        mean_z, logvar_z = self.posterior(x1, x2, training=training)
        if training and rz is not None:
            z = mean_z + jnp.exp(0.5 * logvar_z) * jax.random.normal(
                rz, mean_z.shape)
        else:
            z = mean_z
        mean_l1, logvar_l1, lib1 = self.enc_l1(x1_, rl1, training=training)

        # shared decode stack + model-variant latent split (scmvae.py:392-418)
        if len(self.decoder_share) >= 1:
            latents = self.share(z, training=training)
            if self.model == 0:
                latent_1 = latent_2 = latents
            elif self.model == 1:
                latent_1 = latents[:, :self.share_hidden]
                latent_2 = latents[:, self.share_hidden:]
            elif self.model == 2:
                latent_1 = jnp.concatenate([z, latents[:, :self.share_hidden]], 1)
                latent_2 = latents[:, self.share_hidden:]
            else:
                latent_1 = jnp.concatenate([z, latents], 1)
                latent_2 = latents
        else:
            latent_1 = latent_2 = z

        norm1, recon1, disp1, drop1 = self.dec1(latent_1, lib1,
                                                training=training)
        out = dict(mean_z=mean_z, logvar_z=logvar_z, latent_z=z,
                   norm_x1=norm1, recon_x1=recon1, disper_x=disp1,
                   dropout_rate=drop1, mean_l=mean_l1, logvar_l=logvar_l1,
                   library=lib1)
        if self.type2 == "ZINB":
            mean_l2, logvar_l2, lib2 = self.enc_l2(x2_, rl2, training=training)
            norm2, recon2, disp2, drop2 = self.dec2(latent_2, lib2,
                                                    training=training)
            out.update(norm_x2=norm2, recon_x2=recon2, disper_x2=disp2,
                       dropout_rate_2=drop2, mean_l2=mean_l2,
                       logvar_l2=logvar_l2, library2=lib2)
        else:
            out["recon_x2"] = self.dec2(latent_2, training=training)
        return out

    def embed(self, x1, x2):
        return self.posterior(x1, x2)[0]

    def get_gamma(self, z):
        """GMM responsibilities p(c|z) (parity: scmvae.py:555-571)."""
        pi = nn.softmax(self.pi_logit)
        var_c = jnp.exp(self.logvar_c)
        log_pdf = -jnp.sum(
            0.5 * jnp.log(2 * jnp.pi * var_c)[None]
            + (z[:, :, None] - self.mu_c[None]) ** 2 / (2 * var_c[None]),
            axis=1)
        p_c_z = jnp.exp(jnp.log(pi)[None] + log_pdf) + 1e-10
        return p_c_z / jnp.sum(p_c_z, axis=1, keepdims=True)

    def gmm_kl(self, z, mean_z, logvar_z):
        """GMM ELBO KL term (parity: utils/loss.py GMM_loss, :578-606)."""
        gamma = self.get_gamma(z)
        pi = nn.softmax(self.pi_logit)
        var_c = jnp.exp(self.logvar_c)
        mu_e = mean_z[:, :, None]
        lv_e = logvar_z[:, :, None]
        logpzc = -0.5 * jnp.sum(
            gamma * jnp.sum(jnp.log(2 * jnp.pi) + jnp.log(var_c)[None]
                            + jnp.exp(lv_e) / var_c[None]
                            + (mu_e - self.mu_c[None]) ** 2 / var_c[None],
                            axis=1), axis=1)
        logpc = jnp.sum(gamma * jnp.log(pi)[None], axis=1)
        qentropy = -0.5 * jnp.sum(1 + logvar_z + jnp.log(2 * jnp.pi), axis=1)
        logqcx = jnp.sum(gamma * jnp.log(gamma), axis=1)
        return -logpzc - logpc + qentropy + logqcx


class scMVAE(BaseRegressionMethod):
    """scMVAE-PoE model (parity: scmvae.py:282).

    Accepts the reference constructor layout (layer lists whose first entry
    is the input dim) or the compact keyword form (``z_dim``/``seed``).
    """

    _DISPLAY_ATTRS = ("z_dim", "Type", "penality", "n_centroids")

    def __init__(self, encoder_1=None, hidden_1=None, Z_DIMS: int = 16,
                 decoder_share=None, share_hidden: int = 128, decoder_1=None,
                 hidden_2=None, encoder_l=None, hidden3=None, encoder_2=None,
                 hidden_4=None, encoder_l1=None, hidden3_1=None, decoder_2=None,
                 hidden_5=None, drop_rate: float = 0.1,
                 log_variational: bool = True, Type: str = "Bernoulli",
                 device: str = "auto", n_centroids: int = 19,
                 penality: str = "GMM", model: int = 2, *,
                 z_dim: Optional[int] = None, seed: int = 0, **kwargs):
        self.z_dim = z_dim or Z_DIMS
        self.hidden1 = tuple(encoder_1[1:]) if encoder_1 else (128,)
        self.hidden2 = tuple(encoder_2[1:]) if encoder_2 else (128,)
        self.hidden_l = tuple(encoder_l[1:]) if encoder_l else (128,)
        self.decoder_share = (tuple(decoder_share[1:]) if decoder_share
                              else (128, 256))
        self.share_hidden = share_hidden
        self.dec1_hidden = tuple(decoder_1[1:]) if decoder_1 else (128,)
        self.dec2_hidden = tuple(decoder_2[1:]) if decoder_2 else (128,)
        self.Type = Type
        self.n_centroids = n_centroids
        self.penality = penality
        self.model = model
        self.log_variational = log_variational
        self.droprate = drop_rate
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

    # --- loss ----------------------------------------------------------------

    def _elbo_terms(self, params, x1, x2, libm1, libv1, libm2, libv2, key,
                    training):
        out = self.net.apply(
            {"params": params}, x1, x2, rng=key, training=training,
            rngs={"dropout": jax.random.fold_in(key, 7)} if training else {})
        loss1 = zinb_nll(x1, out["recon_x1"], out["disper_x"],
                         out["dropout_rate"], reduce=False).sum(1)
        if self.Type == "ZINB":
            loss2 = zinb_nll(x2, out["recon_x2"], out["disper_x2"],
                             out["dropout_rate_2"], reduce=False).sum(1)
            kl_l2 = _normal_kl(out["mean_l2"], out["logvar_l2"], libm2, libv2)
        else:
            if self.Type == "Bernoulli":
                loss2 = _bernoulli_nll(out["recon_x2"], x2)
            elif self.Type == "Possion":
                loss2 = _poisson_nll(out["recon_x2"], x2)
            else:
                loss2 = _masked_mse(out["recon_x2"], x2)
            kl_l2 = jnp.zeros(x1.shape[0])
        kl_l1 = _normal_kl(out["mean_l"], out["logvar_l"], libm1, libv1)
        if self.penality == "GMM":
            kl_z = self.net.apply({"params": params}, out["latent_z"],
                                  out["mean_z"], out["logvar_z"],
                                  method=self.net.gmm_kl)
        else:
            # reference passes exp(logvar_z) as the Normal *scale* here too
            kl_z = _normal_kl(out["mean_z"], out["logvar_z"],
                              jnp.zeros_like(out["mean_z"]),
                              jnp.ones_like(out["mean_z"]))
        return loss1, loss2, kl_l1, kl_l2, kl_z

    @partial(jax.jit, static_argnames=("self",))
    def _epoch(self, params, opt_state, x1, x2, libm1, libv1, libm2, libv2,
               kl_weight, key):
        n = x1.shape[0]
        idx = epoch_batches(jax.random.fold_in(key, 1), n, self._batch_size)

        def step(carry, batch_idx):
            params, opt_state, key = carry
            key, sk = jax.random.split(key)
            b = lambda a: a[batch_idx]  # noqa: E731

            def loss_fn(params):
                l1, l2, kl1, kl2, klz = self._elbo_terms(
                    params, b(x1), b(x2), b(libm1), b(libv1), b(libm2),
                    b(libv2), sk, True)
                return jnp.mean(self._scale_factor * l1 + l2 + kl1 + kl2
                                + kl_weight * klz)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self._tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state, key), loss

        (params, opt_state, _), losses = jax.lax.scan(
            step, (params, opt_state, jax.random.fold_in(key, 2)), idx)
        return params, opt_state, losses.mean()

    @partial(jax.jit, static_argnames=("self", "epochs", "anneal_epoch",
                                       "adjust_epoch"))
    def _fit_epochs(self, params, opt_state, x1, x2, libm1, libv1, libm2,
                    libv2, key, lr, final_rate, epochs: int,
                    anneal_epoch: int, adjust_epoch: int):
        """All epochs as ONE dispatch: the reference's stepped lr decay, KL
        warmup and best-loss snapshot (scmvae.py:625) are pure functions of
        the epoch index, so the whole schedule runs in-trace — no per-epoch
        host sync over the relay."""
        def body(carry, e):
            params, opt_state, best_loss, best_params = carry
            opt_state.hyperparams["learning_rate"] = jnp.maximum(
                lr * jnp.power(0.9, (e // adjust_epoch).astype(jnp.float32)),
                final_rate)
            kl_weight = jnp.minimum(1.0, e.astype(jnp.float32) / anneal_epoch)
            params, opt_state, loss = self._epoch(
                params, opt_state, x1, x2, libm1, libv1, libm2, libv2,
                kl_weight, jax.random.fold_in(key, e))
            improved = loss < best_loss
            best_params = jax.tree_util.tree_map(
                lambda b, p: jnp.where(improved, p, b), best_params, params)
            best_loss = jnp.where(improved, loss, best_loss)
            return (params, opt_state, best_loss, best_params), loss

        init = (params, opt_state, jnp.float32(jnp.inf), params)
        (params, opt_state, best_loss, best_params), losses = jax.lax.scan(
            body, init, jnp.arange(1, epochs + 1))
        return best_params, opt_state, losses

    # --- training ------------------------------------------------------------

    def init_gmm_params(self, x1=None, x2=None):
        """Warm-start the GMM prior from an sklearn diagonal GaussianMixture
        over the current latent (parity: scmvae.py:573-592)."""
        from sklearn.mixture import GaussianMixture
        if x1 is None:
            x1, x2 = self._x1, self._x2
        z = np.asarray(self.net.apply({"params": self.params}, x1, x2,
                                      method=self.net.embed))
        gmm = GaussianMixture(n_components=self.n_centroids,
                              covariance_type="diag", reg_covar=1e-4,
                              random_state=self.seed)
        gmm.fit(z)
        import flax.core
        params = flax.core.unfreeze(self.params)
        params["mu_c"] = jnp.asarray(gmm.means_.T, jnp.float32)
        params["logvar_c"] = jnp.log(
            jnp.asarray(gmm.covariances_.T, jnp.float32))
        params["pi_logit"] = jnp.log(
            jnp.asarray(gmm.weights_, jnp.float32) + 1e-8)
        self.params = params

    def fit(self, x_mod1, x_mod2, epochs: int = 200, lr: float = 1e-3, *,
            batch_size: int = 64, weight_decay: float = 1e-6, eps: float = 0.01,
            anneal_epoch: int = 200, final_rate: float = 1e-4,
            scale_factor: float = 4.0, adjust_epoch: int = 10):
        """Train with KL warmup and stepped lr decay (parity: scmvae.py:625).

        ``x_mod1`` is the raw count modality (the ZINB decoder reconstructs
        counts; ``log_variational`` log1p's the encoder view internally);
        ``x_mod2`` is binarized for the default Bernoulli decoder.
        """
        x1 = as_device(x_mod1, jnp.float32)
        x2 = as_device(x_mod2, jnp.float32)
        if self.Type == "Bernoulli":
            x2 = (x2 > 0).astype(jnp.float32)

        # device-side log-library stats (same math as
        # calculate_log_library_size; keeps pre-uploaded inputs on chip)
        def _lib(x):
            lib = jnp.log(jnp.maximum(x.sum(1), 1e-7))
            n = x.shape[0]
            return (jnp.full((n, 1), lib.mean(), jnp.float32),
                    jnp.full((n, 1), lib.var(), jnp.float32))

        libm1, libv1 = _lib(x1)
        libm2, libv2 = _lib(x2) if self.Type == "ZINB" else (libm1, libv1)
        self._batch_size = min(batch_size, x1.shape[0])
        self._scale_factor = scale_factor

        self.net = _scMVAENet(
            dim1=x1.shape[1], dim2=x2.shape[1], z_dim=self.z_dim,
            hidden1=self.hidden1, hidden2=self.hidden2, hidden_l=self.hidden_l,
            decoder_share=self.decoder_share, share_hidden=self.share_hidden,
            dec1_hidden=self.dec1_hidden, dec2_hidden=self.dec2_hidden,
            type2=self.Type, n_centroids=self.n_centroids, model=self.model,
            log_variational=self.log_variational, droprate=self.droprate)
        key = jax.random.key(self.seed)
        self.params = self.net.init(
            {"params": key, "dropout": jax.random.fold_in(key, 3)},
            x1[:1], x2[:1])["params"]
        self._x1, self._x2 = x1, x2
        if self.penality == "GMM":
            self.init_gmm_params()

        self._tx = optax.inject_hyperparams(optax.adamw)(
            learning_rate=lr, weight_decay=weight_decay, eps=eps)
        opt_state = self._tx.init(self.params)
        self.params, opt_state, losses = self._fit_epochs(
            self.params, opt_state, x1, x2, libm1, libv1, libm2, libv2,
            jax.random.fold_in(key, 11), jnp.float32(lr),
            jnp.float32(final_rate), epochs, anneal_epoch, adjust_epoch)
        losses = np.asarray(losses)
        for epoch in range(49, epochs, 50):
            logger.info("scMVAE epoch %d, loss %.5f", epoch + 1, losses[epoch])
        return self

    def predict(self, x_mod1=None, x_mod2=None):
        """Joint embedding: PoE posterior mean (parity: _out_Batch out='Z')."""
        if x_mod1 is None:
            x1, x2 = self._x1, self._x2
        else:
            x1 = jnp.asarray(as_numpy(x_mod1), jnp.float32)
            x2 = jnp.asarray(as_numpy(x_mod2), jnp.float32)
            if self.Type == "Bernoulli":
                x2 = (x2 > 0).astype(jnp.float32)
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


class ProductOfExperts:
    """Callable PoE combiner (parity: scmvae.py:844); delegates to
    :func:`product_of_experts`."""

    def __call__(self, mu, logvar, eps: float = 1e-8):
        return product_of_experts(jnp.asarray(mu), jnp.asarray(logvar), eps=eps)

    forward = __call__


def prior_expert(size):
    """Spherical N(0, I) prior expert parameters (parity: scmvae.py:862)."""
    return jnp.zeros(size), jnp.zeros(size)


# reference name for the shared dense-stack builder (scmvae.py:build_multi_layers)
from dance_tpu.nn.mlp import buildNetwork as build_multi_layers  # noqa: E402,F401

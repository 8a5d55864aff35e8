"""DCCA: dual modality VAEs with cycle-consistent attention transfer.

Parity target: dance/modules/multi_modality/joint_embedding/dcca.py. The
reference trains a count VAE (NB/ZINB decoder with a log-library scale factor,
dcca.py:176-237) on modality 1 and a Bernoulli VAE on modality 2, alternating
"cycles" in which one model is frozen and the other minimizes
NLL + warmup·KL + sf·attention(latent, frozen latent) (VAE.fit, :377-470;
DCCA.fit cycle schedule, :733-826). The joint embedding is the concatenation
of both latent means (:894-1005).

TPU-native: each phase is a jitted full-batch epoch scan; the frozen model's
latents are precomputed once per phase (the reference re-runs the frozen
model per batch — same values, since it is in eval mode).
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
from dance_tpu.utils.loss import nb_nll, zinb_nll
from dance_tpu.utils.wrappers import as_numpy


class _MLP(nn.Module):
    dims: Tuple[int, ...]
    droprate: float = 0.1

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        for d in self.dims:
            x = nn.relu(nn.Dense(d)(x))
            x = nn.Dropout(self.droprate, deterministic=not training)(x)
        return x


class _ModalityVAE(nn.Module):
    """One DCCA modality VAE (parity: dcca.py VAE, :277-375).

    ``likelihood``: 'NB' / 'ZINB' (count decoder with softmax scale × library
    size, per-gene dispersion) or 'Bernoulli' (sigmoid decoder + BCE).
    """

    input_dim: int
    hidden: Tuple[int, ...]
    z_dim: int
    likelihood: str = "NB"
    droprate: float = 0.1

    def setup(self):
        self.encoder = _MLP(self.hidden, self.droprate)
        self.fc_mean = nn.Dense(self.z_dim)
        self.fc_logvar = nn.Dense(self.z_dim)
        self.decoder = _MLP(tuple(reversed(self.hidden)), self.droprate)
        self.dec_scale = nn.Dense(self.input_dim)
        if self.likelihood in ("NB", "ZINB"):
            self.dec_disp = nn.Dense(self.input_dim)
        if self.likelihood == "ZINB":
            self.dec_drop = nn.Dense(self.input_dim)

    def encode(self, x, *, training: bool = False):
        h = self.encoder(x, training=training)
        return self.fc_mean(h), self.fc_logvar(h), h

    def __call__(self, x, log_sf, rng=None, *, training: bool = False):
        mean, logvar, hidden = self.encode(x, training=training)
        if training and rng is not None:
            z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape)
        else:
            z = mean
        h = self.decoder(z, training=training)
        out = {"mean": mean, "logvar": logvar, "latent": z, "hidden": hidden}
        if self.likelihood in ("NB", "ZINB"):
            norm_x = jax.nn.softmax(self.dec_scale(h), axis=1)
            out["scale_x"] = jnp.exp(log_sf)[:, None] * norm_x
            out["disp"] = jnp.exp(jnp.clip(self.dec_disp(h), -15, 15))
            if self.likelihood == "ZINB":
                out["dropout"] = nn.sigmoid(self.dec_drop(h))
        else:  # Bernoulli
            out["scale_x"] = nn.sigmoid(self.dec_scale(h))
        return out

    def nll(self, out, x_raw):
        """Per-cell negative log likelihood (summed over features)."""
        if self.likelihood == "NB":
            return nb_nll(x_raw, out["scale_x"], out["disp"], reduce=False).sum(1)
        if self.likelihood == "ZINB":
            return zinb_nll(x_raw, out["scale_x"], out["disp"], out["dropout"],
                            reduce=False).sum(1)
        p = jnp.clip(out["scale_x"], 1e-7, 1 - 1e-7)
        return -(x_raw * jnp.log(p) + (1 - x_raw) * jnp.log1p(-p)).sum(1)


def _gaussian_kl(mean, logvar):
    """KL(N(mean, exp(logvar)) || N(0, 1)), per cell."""
    return 0.5 * jnp.sum(jnp.exp(logvar) + mean ** 2 - 1.0 - logvar, axis=1)


def _make_attention(name):
    """Attention-transfer loss dispatch (parity: dcca.py:704-726). Takes the
    training model's output dict plus the frozen model's latent and (mean,
    logvar) stats; returns a per-cell vector or a scalar."""
    from dance_tpu.utils import loss as L
    if name == "NST":
        return lambda out, z_pre, stats: L.NSTLoss().nst_loss(
            out["latent"][:, :, None], z_pre[:, :, None])
    if name == "FT":
        return lambda out, z_pre, stats: L.FactorTransfer()(
            out["latent"][:, :, None, None], z_pre[:, :, None, None])
    if name == "SL":
        return lambda out, z_pre, stats: L.Similarity.similarity_loss(
            out["latent"], z_pre)
    if name == "CC":
        return lambda out, z_pre, stats: L.Correlation()(out["latent"], z_pre)
    if name == "AT":
        return lambda out, z_pre, stats: L.Attention()(out["latent"], z_pre)
    if name == "KL_div":
        return lambda out, z_pre, stats: L.KL_diver()(
            out["mean"], out["logvar"], stats[0], stats[1])
    if name == "L1":
        return lambda out, z_pre, stats: L.L1_dis()(out["latent"], z_pre)
    return lambda out, z_pre, stats: L.Eucli_dis()(out["latent"], z_pre)


class DCCA(BaseRegressionMethod):
    """DCCA model (parity: dcca.py:649).

    Parameters mirror the reference constructor: per-modality encoder stacks
    (``layer_e_*``), latent sizes, decoder stacks, likelihood types, cycle
    count, and the attention scale factors ``sf1``/``sf2``.
    """

    _DISPLAY_ATTRS = ("z_dim", "cycle", "type_1", "type_2")

    def __init__(self, layer_e_1=(128,), hidden1_1: int = 128, Zdim_1: int = 16,
                 layer_d_1=(128,), hidden2_1: int = 128, layer_e_2=(128,),
                 hidden1_2: int = 128, Zdim_2: int = 16, layer_d_2=(128,),
                 hidden2_2: int = 128, args=None, ground_truth1=None,
                 Type_1: str = "NB", Type_2: str = "Bernoulli", cycle: int = 1,
                 attention_loss: str = "Eucli", droprate: float = 0.1, *,
                 z_dim: Optional[int] = None, sf1: float = 2.0, sf2: float = 1.0,
                 seed: int = 0):
        self.z_dim = z_dim or Zdim_1
        self.z_dim2 = Zdim_2 if z_dim is None else z_dim
        self.hidden1 = tuple(layer_e_1)[0:] or (128,)
        self.hidden2 = tuple(layer_e_2)[0:] or (128,)
        self.type_1 = Type_1
        self.type_2 = Type_2
        self.cycle = cycle
        self.attention_loss = attention_loss
        self._attn = _make_attention(attention_loss)
        self.droprate = droprate
        self.sf1 = sf1
        self.sf2 = sf2
        self.seed = seed
        self.params1 = self.params2 = None

    @staticmethod
    def preprocessing_pipeline(log_level: LogLevel = "INFO"):
        from dance_tpu.transforms import SetConfig
        return SetConfig({"feature_mod": ["mod1", "mod2"],
                          "feature_channel": [None, None],
                          "feature_channel_type": ["X", "X"],
                          "label_mod": "mod1", "label_channel": "cell_type",
                          "label_channel_type": "obs"}, log_level=log_level)

    # --- jitted phase epoch -------------------------------------------------

    @partial(jax.jit, static_argnames=("self", "which", "use_attention"))
    def _phase_epoch(self, params, opt_state, x, x_raw, log_sf, z_pre, stats_pre,
                     kl_weight, key, which: int, use_attention: bool, idx=None):
        """One phase epoch. ``idx=None`` runs full-batch (one step over all
        cells); an (nb, bs) index matrix runs a scanned minibatch epoch —
        peak activation memory scales with the batch, not the dataset, which
        is what lets DCCA train datasets the reference OOMs on (SURVEY §6:
        dcca needs >64GB there)."""
        net = self.net1 if which == 1 else self.net2
        sf_att = self.sf2 if which == 1 else self.sf1
        mean_pre, logvar_pre = stats_pre

        def loss_fn(params, bx, bxr, blsf, bz, bm, blv, rng):
            out = net.apply({"params": params}, bx, blsf, rng=rng, training=True,
                            rngs={"dropout": jax.random.fold_in(rng, 3)})
            loss = net.nll(out, bxr) + kl_weight * _gaussian_kl(
                out["mean"], out["logvar"])
            if use_attention:
                loss = loss + sf_att * self._attn(out, bz, (bm, blv))
            return jnp.mean(loss)

        if idx is None:
            loss, grads = jax.value_and_grad(loss_fn)(
                params, x, x_raw, log_sf, z_pre, mean_pre, logvar_pre, key)
            updates, opt_state = self._tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        def step(carry, batch_idx):
            params, opt_state, key = carry
            key, rng = jax.random.split(key)
            loss, grads = jax.value_and_grad(loss_fn)(
                params, x[batch_idx], x_raw[batch_idx], log_sf[batch_idx],
                z_pre[batch_idx], mean_pre[batch_idx], logvar_pre[batch_idx],
                rng)
            updates, opt_state = self._tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state, key), loss

        (params, opt_state, _), losses = jax.lax.scan(
            step, (params, opt_state, key), idx)
        return params, opt_state, losses.mean()

    def _latent(self, which: int):
        net, params = ((self.net1, self.params1) if which == 1
                       else (self.net2, self.params2))
        x, log_sf = (self._x1, self._lsf1) if which == 1 else (self._x2, self._lsf2)
        out = net.apply({"params": params}, x, log_sf)
        return out["latent"], out["mean"], out["logvar"]

    def _run_phase(self, which: int, use_attention: bool, epochs: int, lr: float,
                   key, anneal_epoch: int = 10):
        from dance_tpu.utils.batch import epoch_batches
        params = self.params1 if which == 1 else self.params2
        x, xr, lsf = ((self._x1, self._xr1, self._lsf1) if which == 1
                      else (self._x2, self._xr2, self._lsf2))
        if use_attention:
            z_pre, mean_pre, logvar_pre = self._latent(2 if which == 1 else 1)
        else:
            z_pre = jnp.zeros((x.shape[0], self.z_dim))
            mean_pre = logvar_pre = z_pre
        self._tx = optax.adamw(lr, weight_decay=5e-4)
        opt_state = self._tx.init(params)
        for epoch in range(1, epochs + 1):
            key, ek = jax.random.split(key)
            kl_weight = min(1.0, epoch / anneal_epoch)
            idx = (None if self._batch_size is None else
                   epoch_batches(jax.random.fold_in(ek, 7), x.shape[0],
                                 self._batch_size))
            params, opt_state, loss = self._phase_epoch(
                params, opt_state, x, xr, lsf, z_pre, (mean_pre, logvar_pre),
                kl_weight, ek, which, use_attention, idx)
        if which == 1:
            self.params1 = params
        else:
            self.params2 = params
        return float(loss)

    def fit(self, x_mod1, x_mod2, x_mod1_raw=None, x_mod2_raw=None, *,
            epochs: int = 100, lr1: float = 1e-2, lr2: float = 1e-2,
            first: str = "RNA", batch_size: Optional[int] = None):
        """Cycle training (parity: DCCA.fit, dcca.py:733-826).

        used_cycle 0 initializes the modality-1 VAE alone; odd cycles train
        the modality-2 VAE with attention transfer from the frozen modality-1
        latents (twice on cycle 1, mirroring the reference); later even
        cycles re-train modality 1 with attention from modality 2.

        ``batch_size=None`` (default) trains full-batch — one fused step per
        epoch; set it to scan shuffled minibatches instead (the reference's
        DataLoader mode) so activation memory scales with the batch, for
        datasets beyond HBM capacity.
        """
        self._batch_size = batch_size
        from dance_tpu.utils.wrappers import as_device
        x1 = as_device(x_mod1, jnp.float32)
        x2 = as_device(x_mod2, jnp.float32)
        xr1 = (as_device(x_mod1_raw, jnp.float32)
               if x_mod1_raw is not None else jnp.expm1(jnp.maximum(x1, 0.0)))
        xr2 = (as_device(x_mod2_raw, jnp.float32)
               if x_mod2_raw is not None else (x2 > 0).astype(jnp.float32))
        self._x1, self._x2, self._xr1, self._xr2 = x1, x2, xr1, xr2
        self._lsf1 = jnp.log(jnp.maximum(xr1.sum(1), 1.0))
        self._lsf2 = jnp.log(jnp.maximum(xr2.sum(1), 1.0))

        self.net1 = _ModalityVAE(input_dim=x1.shape[1], hidden=self.hidden1,
                                 z_dim=self.z_dim, likelihood=self.type_1,
                                 droprate=self.droprate)
        self.net2 = _ModalityVAE(input_dim=x2.shape[1], hidden=self.hidden2,
                                 z_dim=self.z_dim2, likelihood=self.type_2,
                                 droprate=self.droprate)
        key = jax.random.key(self.seed)
        k1, k2, key = jax.random.split(key, 3)
        self.params1 = self.net1.init({"params": k1, "dropout": k1}, x1[:1],
                                      self._lsf1[:1])["params"]
        self.params2 = self.net2.init({"params": k2, "dropout": k2}, x2[:1],
                                      self._lsf2[:1])["params"]

        for used_cycle in range(self.cycle + 1):
            key, pk = jax.random.split(key)
            if used_cycle == 0:
                loss = self._run_phase(1, False, epochs, lr1, pk)
            elif used_cycle == 1:
                key, pk2 = jax.random.split(key)
                loss = self._run_phase(2, False, epochs, lr2, pk)
                if self.attention_loss is not None:
                    loss = self._run_phase(2, True, epochs, lr2, pk2)
            elif used_cycle % 2 == 0:
                loss = self._run_phase(1, True, epochs, lr1, pk)
            else:
                loss = self._run_phase(2, True, epochs, lr2, pk)
            logger.info("DCCA cycle %d done, loss %.5f", used_cycle, loss)
        return self

    def predict(self, x_mod1=None, x_mod2=None):
        """Joint embedding: concat of both modality latent means (dcca.py:985)."""
        if x_mod1 is not None:
            self._x1 = jnp.asarray(as_numpy(x_mod1), jnp.float32)
            self._x2 = jnp.asarray(as_numpy(x_mod2), jnp.float32)
            self._lsf1 = jnp.zeros(self._x1.shape[0])
            self._lsf2 = jnp.zeros(self._x2.shape[0])
        z1 = self._latent(1)[1]
        z2 = self._latent(2)[1]
        return np.asarray(jnp.concatenate([z1, z2], axis=1))

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

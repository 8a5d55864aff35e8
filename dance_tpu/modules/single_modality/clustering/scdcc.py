"""scDCC: ZINB-AE + DEC with pairwise must-link/cannot-link constraints.

Parity target: dance/modules/single_modality/clustering/scdcc.py (scDeepCluster
backbone plus constraint losses over provided ML/CL index pairs). The
constraint terms use the standard scDCC formulation: for a must-link pair the
soft assignments should overlap (−log Σ_k q_i q_j), for a cannot-link pair they
should not (−log(1 − Σ_k q_i q_j)).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dance_tpu.modules.single_modality.clustering.scdeepcluster import ScDeepCluster
from dance_tpu.settings import logger
from dance_tpu.transforms import (AnnDataTransform, Compose, FilterGenesTopK, SaveRaw,
                                  SetConfig)
from dance_tpu.typing import LogLevel, Optional, Tuple
from dance_tpu.utils.loss import cluster_kl_loss, soft_assign, target_distribution, zinb_nll
from dance_tpu.utils.wrappers import as_numpy


class ScDCC(ScDeepCluster):
    """scDCC model (parity: scdcc.py:60)."""

    def __init__(self, input_dim: int, z_dim: int, n_clusters: int,
                 encodeLayer=(256, 64), decodeLayer=(64, 256), activation="relu",
                 sigma: float = 2.5, alpha: float = 1.0, gamma: float = 1.0,
                 ml_weight: float = 1.0, cl_weight: float = 1.0, device: str = "auto",
                 pretrain_path: Optional[str] = None, seed: int = 0):
        super().__init__(input_dim, z_dim, encodeLayer, decodeLayer, activation, sigma,
                         alpha, gamma, device, pretrain_path, seed)
        self.n_clusters = n_clusters
        self.ml_weight = ml_weight
        self.cl_weight = cl_weight

    @staticmethod
    def preprocessing_pipeline(n_top_genes: int = 2000, log_level: LogLevel = "INFO"):
        return Compose(
            AnnDataTransform("sc.pp.filter_genes", min_counts=1),
            AnnDataTransform("sc.pp.filter_cells", min_counts=1),
            FilterGenesTopK(num_genes=n_top_genes, mode="var"),
            SaveRaw(),
            AnnDataTransform("sc.pp.normalize_total"),
            AnnDataTransform("sc.pp.log1p"),
            AnnDataTransform("sc.pp.scale"),
            SetConfig({"feature_channel": [None, None, "n_counts"],
                       "feature_channel_type": ["X", "raw_X", "obs"],
                       "label_channel": "Group"}),
            log_level=log_level,
        )

    def _constraint_loss_impl(self, params, mu, x, ml1, ml2, cl1, cl2):
        z = self.model.apply({"params": params}, x, method=self.model.encode)
        q = soft_assign(z, mu, self.alpha)
        ml_overlap = jnp.sum(q[ml1] * q[ml2], axis=1)
        cl_overlap = jnp.sum(q[cl1] * q[cl2], axis=1)
        ml_loss = -jnp.log(ml_overlap + 1e-10).mean() if ml1.shape[0] else 0.0
        cl_loss = -jnp.log(1.0 - cl_overlap + 1e-10).mean() if cl1.shape[0] else 0.0
        return self.ml_weight * ml_loss + self.cl_weight * cl_loss

    @partial(jax.jit, static_argnames=("self",))
    def _constraint_loss(self, params, mu, x, ml1, ml2, cl1, cl2):
        return self._constraint_loss_impl(params, mu, x, ml1, ml2, cl1, cl2)

    @partial(jax.jit, static_argnames=("self",))
    def _constraint_step(self, params, mu, c_state, x, ml1, ml2, cl1, cl2):
        """One full-batch constraint update as a single compiled dispatch
        (the previous op-by-op ``jax.grad`` retraced and ran the backward
        unjitted every epoch)."""
        grads = jax.grad(self._constraint_loss_impl, argnums=(0, 1))(
            params, mu, x, ml1, ml2, cl1, cl2)
        updates, c_state = self._ctx.update(grads, c_state, (params, mu))
        params, mu = optax.apply_updates((params, mu), updates)
        return params, mu, c_state

    def fit(self, inputs: Tuple, y=None, n_clusters: Optional[int] = None,
            ml_ind1=None, ml_ind2=None, cl_ind1=None, cl_ind2=None,
            lr: float = 1.0, batch_size: int = 256, epochs: int = 10,
            update_interval: int = 1, tol: float = 1e-3, pt_batch_size: int = 256,
            pt_lr: float = 0.001, pt_epochs: int = 50):
        n_clusters = n_clusters or self.n_clusters
        x_np, x_raw, n_counts = (as_numpy(i) for i in inputs)
        self._pretrain(x_np, x_raw, n_counts, batch_size=pt_batch_size, lr=pt_lr,
                       epochs=pt_epochs, force_pretrain=True)

        x = jnp.asarray(x_np, jnp.float32)
        xr = jnp.asarray(x_raw, jnp.float32)
        sf = jnp.asarray(n_counts / np.median(n_counts), jnp.float32)
        ml1 = jnp.asarray(ml_ind1 if ml_ind1 is not None else [], jnp.int32)
        ml2 = jnp.asarray(ml_ind2 if ml_ind2 is not None else [], jnp.int32)
        cl1 = jnp.asarray(cl_ind1 if cl_ind1 is not None else [], jnp.int32)
        cl2 = jnp.asarray(cl_ind2 if cl_ind2 is not None else [], jnp.int32)

        from dance_tpu.ops.cluster import kmeans
        latent = self._encode(self.params, x)
        res = kmeans(latent, n_clusters, n_init=20, seed=self.seed)
        self.mu = jnp.asarray(res.centers)

        try:
            self._cl_tx = optax.adadelta(lr, rho=0.95)
        except AttributeError:
            self._cl_tx = optax.adam(1e-3)
        opt_state = self._cl_tx.init((self.params, self.mu))
        self._ctx = optax.adam(1e-3)
        c_state = self._ctx.init((self.params, self.mu))
        bs = min(batch_size, x.shape[0])

        key = jax.random.fold_in(jax.random.key(self.seed), 13)
        labels_dev = jnp.asarray(res.labels, jnp.int32)
        if y is not None:
            y_arr = np.asarray(y).ravel()
            n_true = int(y_arr.max()) + 1
            y_dev = jnp.asarray(y_arr, jnp.int32)
        else:
            n_true = 0
            y_dev = jnp.zeros_like(labels_dev)
        # ONE dispatch for the whole DEC + constraint protocol (nn/dec_loop.py)
        from dance_tpu.nn.dec_loop import run_dec_loop
        state = (self.params, self.mu, opt_state, c_state)
        data = dict(x=x, xr=xr, sf=sf, ml1=ml1, ml2=ml2, cl1=cl1, cl2=cl2)
        (self.params, self.mu, opt_state, c_state), out = run_dec_loop(
            self._dec_refresh, self._dec_train, state, data, labels_dev, y_dev,
            key, epochs, tol, n_true=n_true, batch_size=bs,
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
        params, mu, _, _ = state
        latent = self.model.apply({"params": params}, data["x"],
                                  method=self.model.encode)
        q = soft_assign(latent, mu, self.alpha)
        return q, latent, target_distribution(q)

    def _dec_train(self, state, p, key, data, batch_size: int):
        params, mu, opt_state, c_state = state
        params, mu, opt_state, loss = self._cluster_epoch_impl(
            params, mu, opt_state, data["x"], data["xr"], data["sf"], p, key,
            batch_size)
        if data["ml1"].shape[0] or data["cl1"].shape[0]:  # static shapes
            params, mu, c_state = self._constraint_step(
                params, mu, c_state, data["x"], data["ml1"], data["ml2"],
                data["cl1"], data["cl2"])
        return (params, mu, opt_state, c_state), loss

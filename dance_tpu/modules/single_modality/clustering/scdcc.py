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

        aris, snapshots = [], []
        key = jax.random.fold_in(jax.random.key(self.seed), 13)
        p = jnp.zeros((x.shape[0], int(self.mu.shape[0])), jnp.float32)
        labels_dev = jnp.asarray(res.labels, jnp.int32)
        if y is not None:
            y_arr = np.asarray(y).ravel()
            n_true = int(y_arr.max()) + 1
            y_dev = jnp.asarray(y_arr, jnp.int32)
        else:
            n_true = 0
            y_dev = jnp.zeros_like(labels_dev)
        first = True
        for epoch in range(epochs):
            refresh = epoch % update_interval == 0
            key, ek = jax.random.split(key)
            prev_params, prev_mu = self.params, self.mu
            (self.params, self.mu, opt_state, p, q, latent, labels, delta,
             ari_v, loss) = self._dec_epoch(self.params, self.mu, opt_state,
                                            x, xr, sf, p, labels_dev, y_dev,
                                            ek, bs, refresh, n_true)
            if ml1.shape[0] or cl1.shape[0]:
                self.params, self.mu, c_state = self._constraint_step(
                    self.params, self.mu, c_state, x, ml1, ml2, cl1, cl2)
            if refresh:
                # DEC early stop on label-change fraction (reference scdcc
                # tol) — device scalar, no q/z pull per epoch
                delta_label = 1.0 if first else float(delta)
                first = False
                self.q, self.z = q, latent
                labels_dev = labels
                snapshots.append((self.q, self.z, labels))
                if y is not None:
                    aris.append(float(ari_v))
                if epoch > 0 and delta_label < tol:
                    logger.info("Reach tolerance threshold (%.3e < %.3e). "
                                "Stopping training.", delta_label, tol)
                    # the fused dispatch already ran this epoch's passes; the
                    # reference breaks before them — roll back
                    self.params, self.mu = prev_params, prev_mu
                    break
            if epoch % 50 == 0:
                logger.info("Epoch %3d: loss %.6f", epoch + 1, float(loss))
        if aris:
            best = int(np.argmax(aris))
            self.q, self.z, labels_dev = snapshots[best]
        self.q, self.z = np.asarray(self.q), np.asarray(self.z)
        self.y_pred = np.asarray(labels_dev)
        return self

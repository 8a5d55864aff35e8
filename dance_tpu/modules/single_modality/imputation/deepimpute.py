"""DeepImpute: per-gene-block MLP ensembles, vmapped on TPU.

Parity target: dance/modules/single_modality/imputation/deepimpute.py (gene
targets split into batches; each batch gets its own predictors-→targets MLP
trained with weighted MSE). The reference trains each subnetwork in a Python
loop; here every subnetwork's parameters live in one vmapped pytree and ALL
ensembles train simultaneously in a single jitted step — the ensemble axis
becomes a batch axis on the MXU.
"""

from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from dance_tpu.nn.zinb_ae import TorchDense
from dance_tpu.utils.batch import epoch_batches, epoch_batches_masked
from dance_tpu.modules.base import BaseRegressionMethod
from dance_tpu.settings import logger
from dance_tpu.transforms import (AnnDataTransform, CellwiseMaskData, Compose,
                                  FilterCellsScanpy, FilterGenesScanpy, GeneHoldout,
                                  SaveRaw, SetConfig)
from dance_tpu.typing import LogLevel, Optional
from dance_tpu.utils.wrappers import as_numpy
from dance_tpu.parallel.mesh import to_device


class _SubNet(nn.Module):
    out_dim: int
    hidden_dim: int = 256
    dropout: float = 0.2
    # torch-matching initializers (reference protocol): torch.nn.Linear draws
    # kernels kaiming-uniform(a=sqrt 5) = U(+-sqrt(1/fan_in)) and biases
    # U(+-sqrt(1/fan_in)); flax's default lecun_normal kernel is ~1.7x wider
    # in std and zero-bias. Under the reference's accumulated-gradient
    # dynamics the init scale shapes the whole trajectory.
    torch_init: bool = False

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        dense = TorchDense if self.torch_init else nn.Dense
        x = dense(self.hidden_dim)(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not training)(x)
        return nn.softplus(dense(self.out_dim)(x))


# reference inner-model name (deepimpute.py:41)
NeuralNetworkModel = _SubNet


class DeepImpute(BaseRegressionMethod):
    """DeepImpute model (parity: deepimpute.py:68)."""

    _DISPLAY_ATTRS = ("sub_outputdim", "hidden_dim", "dropout")

    def __init__(self, predictors, targets, dataset: str = "", sub_outputdim: int = 512,
                 hidden_dim: int = 256, dropout: float = 0.2, seed: int = 1,
                 gpu: int = -1, reference_protocol: bool = False):
        self.predictors = list(predictors)
        self.targets = list(targets)
        self.sub_outputdim = sub_outputdim
        self.hidden_dim = hidden_dim
        self.dropout = dropout
        self.seed = seed
        self.params = None
        # reference_protocol=True reproduces the reference's exact early-
        # stopping protocol (deepimpute.py:267-302): 90/10 val split, plain
        # (unweighted) val MSE, a patience counter that increments on every
        # non-best epoch and NEVER resets on improvement, per-subnet stopping,
        # and torch gradient accumulation (the reference training loop has no
        # optimizer.zero_grad(), so each step applies the running SUM of all
        # past batch gradients). The default protocol instead uses a 95/5
        # split, wMSE val signal, and a consecutive-epoch patience counter.
        self.reference_protocol = reference_protocol

    @staticmethod
    def preprocessing_pipeline(min_cells: float = 0.1, n_top: int = 5,
                               sub_outputdim: int = 512, mask: bool = True,
                               distr: str = "exp", mask_rate: float = 0.1,
                               seed: int = 1, log_level: LogLevel = "INFO"):
        transforms = [
            FilterGenesScanpy(min_cells=min_cells),
            FilterCellsScanpy(min_counts=1),
            SaveRaw(),
            AnnDataTransform("sc.pp.log1p"),
            GeneHoldout(n_top=n_top, batch_size=sub_outputdim),
        ]
        if mask:
            transforms.extend([
                CellwiseMaskData(distr=distr, mask_rate=mask_rate, seed=seed,
                                 add_test_mask=True),
                SetConfig({"feature_channel": [None, None, "targets", "predictors",
                                               "train_mask", "valid_mask", "test_mask"],
                           "feature_channel_type": ["X", "raw_X", "uns", "uns",
                                                    "layers", "layers", "layers"],
                           "label_channel": [None, None],
                           "label_channel_type": ["X", "raw_X"]}),
            ])
        else:
            transforms.append(SetConfig({
                "feature_channel": [None, None, "targets", "predictors"],
                "feature_channel_type": ["X", "raw_X", "uns", "uns"],
                "label_channel": [None, None],
                "label_channel_type": ["X", "raw_X"]}))
        return Compose(*transforms, log_level=log_level)

    # --- padded ensemble layout -------------------------------------------

    def _pad_layout(self):
        """Pad predictor/target index lists to rectangular arrays + masks."""
        p_max = max(len(p) for p in self.predictors)
        t_max = max(len(t) for t in self.targets)
        n_ens = len(self.targets)
        pred_idx = np.zeros((n_ens, p_max), np.int32)
        targ_idx = np.zeros((n_ens, t_max), np.int32)
        targ_mask = np.zeros((n_ens, t_max), np.float32)
        for i, (p, t) in enumerate(zip(self.predictors, self.targets)):
            pred_idx[i, :len(p)] = p
            targ_idx[i, :len(t)] = t
            targ_mask[i, :len(t)] = 1
        return (jnp.asarray(pred_idx), jnp.asarray(targ_idx), jnp.asarray(targ_mask),
                p_max, t_max)

    @partial(jax.jit, static_argnames=("self",))
    def _pregather(self, X, Y, loss_mask):
        """Per-subnet predictor/target views as (n_ens, n, p/t_max) tensors.

        Computed ONCE per fit: the per-step ``bx[:, p_idx]`` minor-axis
        gathers the loss used to do are scalar loads on TPU (~13 ms/step at
        bench scale); hoisting them turns every in-loop gather into a
        contiguous row gather. ``targ_mask`` is folded into the loss mask
        here, which keeps the loss numerics bit-identical."""
        pred_idx, targ_idx, targ_mask = self._idx
        Xp = jnp.moveaxis(jnp.take(X, pred_idx, axis=1), 1, 0)
        Yt = jnp.moveaxis(jnp.take(Y, targ_idx, axis=1), 1, 0)
        Mt = jnp.moveaxis(jnp.take(loss_mask, targ_idx, axis=1), 1, 0)
        return Xp, Yt, Mt * targ_mask[:, None, :]

    @partial(jax.jit, static_argnames=("self", "batch_size"))
    def _train_epoch(self, params, opt_state, Xp, Yt, Mt, key, batch_size: int):
        n = Xp.shape[1]
        # full pass incl. partial batch (reference DataLoader drop_last=False)
        idx = epoch_batches(key, n, batch_size)
        keys = jax.random.split(jax.random.fold_in(key, 7), idx.shape[0])

        def loss_fn(params, bx, by, bm, rng):
            def one(sub_params, x_in, y_t, m_t, r):
                y_hat = self.net.apply({"params": sub_params}, x_in, training=True,
                                       rngs={"dropout": r})
                w = y_t  # wMSE: weight by true expression (parity: deepimpute.py:158)
                return jnp.sum(w * m_t * (y_t - y_hat) ** 2) / jnp.maximum(
                    jnp.sum(m_t), 1.0)

            sub_rngs = jax.random.split(rng, bx.shape[0])
            losses = jax.vmap(one)(params, bx, by, bm, sub_rngs)
            return losses.mean()

        # the scan carries only the (nb, bs) permutation rows; each step
        # gathers its own (n_ens, bs, ·) batch from the pre-gathered views.
        # Materializing the whole epoch up front as (nb, n_ens, bs, ·)
        # copies ~3 full-matrix transposes through HBM per epoch — measured
        # 1.6x slower at 100k cells (benchmarks/profile_deepimpute2.py).
        def step(carry, sl):
            params, opt_state = carry
            rows, r = sl
            bx = jnp.take(Xp, rows, axis=1)
            by = jnp.take(Yt, rows, axis=1)
            bm = jnp.take(Mt, rows, axis=1)
            loss, grads = jax.value_and_grad(loss_fn)(params, bx, by, bm, r)
            updates, opt_state = self._tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), loss

        (params, opt_state), losses = jax.lax.scan(step, (params, opt_state),
                                                   (idx, keys))
        return params, opt_state, losses.mean()

    @partial(jax.jit, static_argnames=("self", "batch_size"))
    def _train_epochs(self, params, opt_state, Xp, Yt, Mt, keys,
                      batch_size: int):
        def epoch(carry, key):
            params, opt_state = carry
            params, opt_state, loss = self._train_epoch(
                params, opt_state, Xp, Yt, Mt, key, batch_size)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(epoch, (params, opt_state),
                                                   keys)
        return params, opt_state, losses

    def fit(self, X, Y, mask=None, batch_size: int = 64, lr: float = 1e-3,
            n_epochs: int = 100, patience: int = 5, train_idx=None):
        X = as_numpy(X).astype(np.float32)
        Y = as_numpy(Y).astype(np.float32)
        if train_idx is not None:
            train_sel = np.asarray(train_idx)
            X, Y = X[train_sel], Y[train_sel]
            mask_arr = (as_numpy(mask)[train_sel].astype(np.float32)
                        if mask is not None else np.ones_like(X))
        else:
            mask_arr = (as_numpy(mask).astype(np.float32) if mask is not None
                        else np.ones_like(X))

        pred_idx, targ_idx, targ_mask, p_max, t_max = self._pad_layout()
        self._idx = (pred_idx, targ_idx, targ_mask)
        self.net = _SubNet(out_dim=t_max, hidden_dim=self.hidden_dim,
                           dropout=self.dropout,
                           torch_init=self.reference_protocol)
        key = jax.random.key(self.seed)

        def init_one(r, p_idx):
            return self.net.init({"params": r, "dropout": r},
                                 jnp.zeros((1, p_max)))["params"]

        keys = jax.random.split(key, pred_idx.shape[0])
        self.params = jax.vmap(init_one)(keys, pred_idx)
        self._tx = optax.adam(lr)
        opt_state = self._tx.init(self.params)

        # 95/5 validation split for early stopping (parity: deepimpute.py:264,
        # :299 — the reference stops each subnet on its val loss with
        # `patience`; the vmapped ensemble shares one val signal, the mean).
        # reference_protocol uses the reference's own 90/10 split instead
        # (deepimpute.py:246-248).
        n = X.shape[0]
        rng = np.random.default_rng(self.seed)
        perm = rng.permutation(n)
        if self.reference_protocol:
            n_val = n - int(n * 0.9) if patience else 0
            tr_sel, val_sel = perm[:int(n * 0.9)], perm[int(n * 0.9):]
        else:
            n_val = max(int(0.05 * n), 1) if n > 20 and patience else 0
            val_sel, tr_sel = perm[:n_val], perm[n_val:]
        Xj, Yj, Mj = self._pregather(to_device(X[tr_sel]), to_device(Y[tr_sel]),
                                     to_device(mask_arr[tr_sel]))
        if n_val:
            Xv, Yv, Mv = self._pregather(
                to_device(X[val_sel]), to_device(Y[val_sel]),
                to_device(mask_arr[val_sel]))
        bs = min(batch_size, len(tr_sel))
        epoch_keys = jax.random.split(key, n_epochs)
        if not n_val:
            # no early stopping: all epochs in one compiled scan (a
            # per-epoch dispatch costs two relay round trips)
            self.params, opt_state, losses = self._train_epochs(
                self.params, opt_state, Xj, Yj, Mj, epoch_keys, bs)
            for epoch in range(0, n_epochs, 20):
                logger.info("DeepImpute epoch %d, wMSE %.6f", epoch,
                            float(losses[epoch]))
            return self
        if self.reference_protocol:
            self.params, best_val, losses, stopped = self._train_epochs_es_ref(
                self.params, opt_state, Xj, Yj, Mj, Xv, Yv, Mv, epoch_keys,
                jnp.int32(patience), bs)
            logger.info("DeepImpute (reference protocol) %d/%d subnets early "
                        "stopped; mean best val MSE %.6f",
                        int(np.asarray(stopped).sum()), len(self.targets),
                        float(np.asarray(best_val).mean()))
            return self
        self.params, opt_state, best_val, losses, vals, _ = self._train_epochs_es(
            self.params, opt_state, Xj, Yj, Mj, Xv, Yv, Mv, epoch_keys,
            jnp.int32(patience), bs)
        losses = np.asarray(losses)
        ran = ~np.isnan(losses)
        for epoch in range(0, int(ran.sum()), 20):
            logger.info("DeepImpute epoch %d, wMSE %.6f", epoch, losses[epoch])
        if not ran.all():
            logger.info("DeepImpute early stopped at epoch %d (val wMSE %.6f)",
                        int(ran.sum()) - 1, float(best_val))
        return self

    @partial(jax.jit, static_argnames=("self", "batch_size"))
    def _train_epochs_es(self, params, opt_state, X, Y, M, Xv, Yv, Mv, keys,
                         patience, batch_size: int):
        """All epochs + early stopping as ONE dispatch.

        The reference stops each subnet on its val loss with `patience`
        (deepimpute.py:264,:299); a host-side loop needs a device→host val
        read every epoch — ~0.7 s of relay latency per epoch against ~2 ms
        of compute.  Instead the whole state machine (best val, best params,
        patience counter, stopped flag) lives in the scan carry; once
        `stopped` trips, lax.cond skips the remaining epochs' compute and
        best-params updates, so the result is bit-identical to breaking out
        of the loop."""
        def epoch(carry, key):
            params, opt_state, best_val, best_params, counter, stopped = carry

            def run(_):
                p2, o2, loss = self._train_epoch(params, opt_state, X, Y, M,
                                                 key, batch_size)
                val = self._val_loss(p2, Xv, Yv, Mv)
                improved = val < best_val
                nb = jax.tree_util.tree_map(
                    lambda b, p: jnp.where(improved, p, b), best_params, p2)
                nbv = jnp.where(improved, val, best_val)
                nc = jnp.where(improved, 0, counter + 1)
                return (p2, o2, nbv, nb, nc, nc >= patience), (loss, val)

            def skip(_):
                return carry, (jnp.float32(jnp.nan), jnp.float32(jnp.nan))

            return jax.lax.cond(stopped, skip, run, None)

        init = (params, opt_state, jnp.float32(jnp.inf), params,
                jnp.int32(0), jnp.bool_(False))
        carry, (losses, vals) = jax.lax.scan(epoch, init, keys)
        params, opt_state, best_val, best_params, counter, stopped = carry
        return best_params, opt_state, best_val, losses, vals, stopped

    @partial(jax.jit, static_argnames=("self", "batch_size"))
    def _train_epochs_es_ref(self, params, opt_state, X, Y, M, Xv, Yv, Mv,
                             keys, patience, batch_size: int):
        """The reference's exact early-stopping state machine, vmapped.

        Reproduces deepimpute.py:267-302 per subnet: the model is saved
        whenever the current val loss EQUALS the running minimum (best-val
        restore at predict, :309-318); the patience counter increments on
        every non-best epoch and never resets; training stops per subnet.
        The optimizer step applies the running SUM of all past batch
        gradients (the reference loop never calls optimizer.zero_grad(),
        :275-279 — torch .grad buffers accumulate across batches AND epochs).
        """
        n_ens = jax.tree_util.tree_leaves(params)[0].shape[0]

        def bc(flag, leaf):  # broadcast a (n_ens,) flag over a stacked leaf
            return flag.reshape((-1,) + (1,) * (leaf.ndim - 1))

        def epoch(carry, key):
            params, opt_state, gsum, best_val, best_params, counter, stopped = carry
            p2, o2, g2, loss = self._train_epoch_accum(params, opt_state, gsum,
                                                       X, Y, M, key, batch_size)
            # freeze subnets that already stopped (per-ens gating; their
            # opt/gsum state is irrelevant once params stop changing)
            p2 = jax.tree_util.tree_map(
                lambda new, old: jnp.where(bc(stopped, new), old, new), p2, params)
            val = self._val_loss_ref(p2, Xv, Yv, Mv)  # (n_ens,)
            active = ~stopped
            improved = (val <= best_val) & active
            nb = jax.tree_util.tree_map(
                lambda b, p: jnp.where(bc(improved, p), p, b), best_params, p2)
            nbv = jnp.where(improved, val, best_val)
            nc = jnp.where(active & ~improved, counter + 1, counter)
            nstopped = stopped | (nc >= patience)
            return (p2, o2, g2, nbv, nb, nc, nstopped), (loss, val)

        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        init = (params, opt_state, zeros, jnp.full((n_ens,), jnp.inf, jnp.float32),
                params, jnp.zeros((n_ens,), jnp.int32),
                jnp.zeros((n_ens,), bool))
        carry, (losses, vals) = jax.lax.scan(epoch, init, keys)
        _, _, _, best_val, best_params, _, stopped = carry
        return best_params, best_val, losses, stopped

    @partial(jax.jit, static_argnames=("self", "batch_size"))
    def _train_epoch_accum(self, params, opt_state, gsum, Xp, Yt, Mt, key,
                           batch_size: int):
        """One epoch with torch-style gradient ACCUMULATION (reference
        protocol): each optimizer step applies the running sum of every batch
        gradient seen so far, exactly like a torch loop that never zeroes
        .grad (deepimpute.py:275-279). Batches follow the reference's exact
        DataLoader shapes (drop_last=False: one short final batch, not the
        wrap-padded stream the default protocol uses) — under integral-
        control dynamics the per-epoch step count changes the trajectory."""
        n = Xp.shape[1]
        idx, bmask = epoch_batches_masked(key, n, batch_size)
        keys = jax.random.split(jax.random.fold_in(key, 7), idx.shape[0])

        def loss_fn(params, bx, by, bm, rng):
            def one(sub_params, x_in, y_t, m_t, r):
                y_hat = self.net.apply({"params": sub_params}, x_in, training=True,
                                       rngs={"dropout": r})
                w = y_t
                return jnp.sum(w * m_t * (y_t - y_hat) ** 2) / jnp.maximum(
                    jnp.sum(m_t), 1.0)

            sub_rngs = jax.random.split(rng, bx.shape[0])
            return jax.vmap(one)(params, bx, by, bm, sub_rngs).mean()

        # per-step batch gathers (see _train_epoch); padded slots zeroed
        # through the per-row mask
        def step(carry, sl):
            params, opt_state, gsum = carry
            rows, brow, r = sl
            bx = jnp.take(Xp, rows, axis=1)
            by = jnp.take(Yt, rows, axis=1)
            bm = jnp.take(Mt, rows, axis=1) * brow[None, :, None]
            loss, grads = jax.value_and_grad(loss_fn)(params, bx, by, bm, r)
            gsum = jax.tree_util.tree_map(jnp.add, gsum, grads)
            updates, opt_state = self._tx.update(gsum, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state, gsum), loss

        (params, opt_state, gsum), losses = jax.lax.scan(
            step, (params, opt_state, gsum), (idx, bmask, keys))
        return params, opt_state, gsum, losses.mean()

    @partial(jax.jit, static_argnames=("self",))
    def _val_loss_ref(self, params, Xp, Yt, Mt):
        """Per-subnet PLAIN val MSE — the reference validates with unweighted
        F.mse_loss (deepimpute.py:287-289), not the wMSE train loss."""
        def one(sub_params, x_in, y, m):
            pred = self.net.apply({"params": sub_params}, x_in)
            return (m * (pred - y) ** 2).sum() / jnp.maximum(m.sum(), 1.0)

        return jax.vmap(one)(params, Xp, Yt, Mt)

    @partial(jax.jit, static_argnames=("self",))
    def _val_loss(self, params, Xp, Yt, Mt):
        def one(sub_params, x_in, y, m):
            pred = self.net.apply({"params": sub_params}, x_in)
            w = y  # same wMSE weighting as the train loss
            return (w * m * (pred - y) ** 2).sum() / jnp.maximum(m.sum(), 1.0)

        return jax.vmap(one)(params, Xp, Yt, Mt).mean()

    @partial(jax.jit, static_argnames=("self",))
    def _predict_all(self, params, X):
        pred_idx, _, _ = self._idx
        Xp = jnp.moveaxis(jnp.take(X, pred_idx, axis=1), 1, 0)

        def one(sub_params, x_in):
            return self.net.apply({"params": sub_params}, x_in)

        return jax.vmap(one)(params, Xp)  # (n_ens, n_cells, t_max)

    def predict(self, X_test, mask=None, test_idx=None, predict_raw: bool = False):
        X = as_numpy(X_test).astype(np.float32)
        if test_idx is not None:
            X = X[np.asarray(test_idx)]
        if mask is not None:
            m = as_numpy(mask)
            if test_idx is not None:
                m = m[np.asarray(test_idx)]
            X = X * m
        preds = np.asarray(self._predict_all(self.params, jnp.asarray(X)))
        out = X.copy()
        for i, t in enumerate(self.targets):
            out[:, t] = preds[i, :, :len(t)]
        return np.expm1(out) if predict_raw else out

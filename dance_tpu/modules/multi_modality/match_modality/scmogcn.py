"""scMoGNN for modality matching (parity: dance/modules/multi_modality/
match_modality/scmogcn.py).

Reference recipe: per-modality cell-feature graph propagation precomputes a
stack of per-layer cell embeddings (cell_feature_propagation, :41-92); a
learnable softmax combination over layers (propagation_layer_combination,
:26-38) feeds two MLP encoders whose L2-normalized embeddings are trained
with a CLIP-style symmetric cross-entropy over the in-batch similarity
logits plus auxiliary cross-/self-reconstruction MSE losses (:186-248).
Matching inference is batch-separated bipartite matching over the aligned
embeddings (:277-313).

TPU design: propagation is a chain of weighted SpMMs with global
standardization between hops (runs once, jitted); the contrastive training
step is a single jitted program whose in-batch logits matmul sits on the MXU.
"""

import math
from functools import partial
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
import scipy.sparse as sp

from dance_tpu.modules.multi_modality.match_modality.base import MatchingScoreMixin
from dance_tpu.ops.sparse import csr_from_scipy, csr_matmat, csr_rmatmat
from dance_tpu.settings import logger
from dance_tpu.utils.metrics import batch_separated_bipartite_matching
from dance_tpu.utils.wrappers import as_numpy


def propagation_layer_combination(X, Y, idx, wt1, wt2, from_logits: bool = True):
    """Learned softmax-weighted combination of the per-layer propagation
    stacks for both modalities (parity: match_modality/scmogcn.py:26-38)."""
    wt1, wt2 = jnp.asarray(wt1), jnp.asarray(wt2)
    if from_logits:
        wt1 = jax.nn.softmax(wt1, -1)
    x = 0
    for i in range(wt1.shape[0]):
        x = x + wt1[i] * jnp.asarray(X[i])[idx]
    if from_logits:
        wt2 = jax.nn.softmax(wt2, -1)
    y = 0
    for i in range(wt2.shape[0]):
        y = y + wt2[i] * jnp.asarray(Y[i])[idx]
    return x, y


def expression_propagation(x: np.ndarray, *, layers: int = 4, alpha: float = 0.5,
                           beta: float = 0.5) -> list:
    """Per-layer propagated cell embeddings over the expression bipartite
    graph (parity: cell_feature_propagation, match_modality/scmogcn.py:41-92).

    Feature nodes start one-hot ('id' init), cells at zero; each hop is a
    weighted-sum conv both ways followed by global standardization and a
    momentum mix.  Returns ``hcell[1:]`` — (layers-1) arrays of shape
    (n_cells, n_features)."""
    a = csr_from_scipy(sp.csr_matrix(x.astype(np.float32)))
    n_cells, n_feat = a.shape

    def std_guarded(h):
        mean = h.mean()
        scale = jnp.where(mean != 0, h.std(), 1.0)
        return (h - mean) / jnp.maximum(scale, 1e-12)

    def std(h):
        return (h - h.mean()) / jnp.maximum(h.std(), 1e-12)

    @jax.jit
    def run():
        h_feat = jnp.eye(n_feat, dtype=jnp.float32)
        h_cell = jnp.zeros((n_cells, n_feat), jnp.float32)
        hcell = []
        for _ in range(layers):
            h1_feat = std_guarded(csr_rmatmat(a, h_cell))
            h1_cell = std_guarded(csr_matmat(a, h_feat))
            h_feat = std(h_feat * alpha + h1_feat * (1 - alpha))
            h_cell = std(h_cell * beta + h1_cell * (1 - beta))
            hcell.append(h_cell)
        return hcell[1:]

    return list(run())


class ScMoGCN(nn.Module):
    """The 4-stack matching MLP (parity: match_modality/scmogcn.py:360-394):
    two encoders (one per modality) with L2-normalized outputs, two decoders,
    and a temperature-scaled similarity head."""

    layers: Tuple[Tuple[Tuple[int, ...], ...], ...]   # 4 stacks of (in, out[, drop])
    temp: float = 1.0

    def setup(self):
        stacks = []
        for j, shape in enumerate(self.layers):
            mods = []
            for i, s in enumerate(shape):
                mods.append(nn.Dense(s[1]))
                if i < len(shape) - 1:
                    mods.append("gelu")
                    if len(s) == 3:
                        mods.append(nn.Dropout(s[2]))
            stacks.append(mods)
        self.stacks = stacks

    def _run(self, j: int, h, deterministic: bool):
        for m in self.stacks[j]:
            if m == "gelu":
                h = nn.gelu(h)
            elif isinstance(m, nn.Dropout):
                h = m(h, deterministic=deterministic)
            else:
                h = m(h)
        return h

    def encode(self, m1, m2, deterministic: bool = True):
        e1 = self._run(0, m1, deterministic)
        e2 = self._run(1, m2, deterministic)
        e1 = e1 / jnp.linalg.norm(e1, axis=-1, keepdims=True)
        e2 = e2 / jnp.linalg.norm(e2, axis=-1, keepdims=True)
        return e1, e2

    def decode(self, e1, e2, deterministic: bool = True):
        return self._run(2, e1, deterministic), self._run(3, e2, deterministic)

    def __call__(self, m1, m2, deterministic: bool = True):
        e1, e2 = self.encode(m1, m2, deterministic)
        return e1 @ e2.T * math.exp(self.temp)

    def init_all(self, m1, m2):
        """Touches all four stacks so init creates every parameter."""
        e1, e2 = self.encode(m1, m2)
        self.decode(e1, e2)
        return e1 @ e2.T


def _symmetric_contrastive_loss(logits):
    """CE(logits, diag) + CE(logitsᵀ, diag) — the CLIP objective
    (match_modality/scmogcn.py:226-227)."""
    n = logits.shape[0]
    labels = jnp.arange(n)
    return (optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
            + optax.softmax_cross_entropy_with_integer_labels(logits.T, labels).mean())


# module-level jits with the (hashable, frozen) flax module as a static arg:
# the compiled step survives across fit() calls and wrapper instances, where
# a fit-local @jax.jit closure would retrace+recompile every fit.  The
# propagated stacks enter as ARGUMENTS: closing over device arrays embeds
# them as constants in the relay's compile payload (HTTP 413).
@partial(jax.jit, static_argnames=("net", "lr", "aux"))
def _match_train_step(params, opt_state, H1, H2, idx, rng, *, net, lr, aux):
    tx = optax.adamw(lr)

    def loss_fn(p):
        X, Y = propagation_layer_combination(H1, H2, idx, p["wt1"], p["wt2"])
        # one encoder pass shared by the contrastive logits and both
        # decode directions (the reference recomputes; same math)
        e1, e2 = net.apply({"params": p["model"]}, X, Y,
                           deterministic=False, rngs={"dropout": rng},
                           method=net.encode)
        logits = e1 @ e2.T * math.exp(net.temp)
        loss = _symmetric_contrastive_loss(logits)
        pred1, pred2 = net.apply({"params": p["model"]}, e2, e1,
                                 deterministic=False, rngs={"dropout": rng},
                                 method=net.decode)
        rec1, rec2 = net.apply({"params": p["model"]}, e1, e2,
                               deterministic=False, rngs={"dropout": rng},
                               method=net.decode)
        loss2 = ((pred1 - X) ** 2).mean() + ((pred2 - Y) ** 2).mean()
        loss3 = ((rec1 - X) ** 2).mean() + ((rec2 - Y) ** 2).mean()
        if aux > 0:
            loss = loss + loss2 + loss3
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, loss


@partial(jax.jit, static_argnames=("net", "lr", "aux", "n_steps", "bs",
                                   "early_stopping"))
def _match_train_run(params, opt_state, H1, H2, train_idx, val_idx, key,
                     epochs, *, net, lr, aux, n_steps: int, bs: int,
                     early_stopping: int):
    """The whole validation-selected contrastive fit as ONE dispatch.

    Per epoch: a device-side shuffle of the training cells, ``n_steps``
    minibatch contrastive steps (scan), a val matching score, best-params
    tracking, and the reference early-stop rule ("global max val is older
    than ``early_stopping`` epochs", match_modality/scmogcn.py:157-275) — all
    inside a lax.while_loop, so the per-step dispatch + per-epoch scalar pull
    the Python loop paid over the axon relay disappears."""
    epochs = jnp.asarray(epochs, jnp.int32)

    def epoch_pass(params, opt_state, ekey):
        perm = jax.random.permutation(ekey, train_idx)[:n_steps * bs]
        bidx = perm.reshape(n_steps, bs)
        rngs = jax.vmap(lambda s: jax.random.fold_in(ekey, s))(
            jnp.arange(n_steps))

        def step(carry, batch):
            params, opt_state = carry
            idx, rng = batch
            params, opt_state, loss = _match_train_step(
                params, opt_state, H1, H2, idx, rng, net=net, lr=lr, aux=aux)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(step, (params, opt_state),
                                                   (bidx, rngs))
        return params, opt_state, losses.mean()

    carry0 = dict(params=params, opt=opt_state, epoch=jnp.int32(0),
                  stop=jnp.bool_(False), best_val=jnp.float32(-jnp.inf),
                  best_epoch=jnp.int32(0), best_params=params,
                  loss=jnp.float32(0), val=jnp.float32(0))

    def cond(c):
        return (c["epoch"] < epochs) & (~c["stop"])

    def body(c):
        e = c["epoch"]
        params, opt, loss = epoch_pass(c["params"], c["opt"],
                                       jax.random.fold_in(key, e))
        val = _match_val_score(params, H1, H2, val_idx, net=net)
        better = val > c["best_val"]
        pick = lambda new, old: jax.tree_util.tree_map(
            lambda a, b: jnp.where(better, a, b), new, old)
        best_epoch = jnp.where(better, e, c["best_epoch"])
        stop = e - best_epoch >= early_stopping
        return dict(params=params, opt=opt, epoch=e + 1, stop=stop,
                    best_val=jnp.maximum(val, c["best_val"]),
                    best_epoch=best_epoch,
                    best_params=pick(params, c["best_params"]),
                    loss=loss, val=val)

    c = jax.lax.while_loop(cond, body, carry0)
    return (c["best_params"], c["opt"], c["best_val"], c["best_epoch"],
            c["epoch"], c["loss"])


@partial(jax.jit, static_argnames=("net",))
def _match_val_score(params, H1, H2, idx, *, net):
    # device-side matching accuracy: pulling the (val, val) logits to the
    # host every epoch costs ~67 MB over the relay at bench scale
    X, Y = propagation_layer_combination(H1, H2, idx, params["wt1"],
                                         params["wt2"])
    logits = net.apply({"params": params["model"]}, X, Y)
    lab = jnp.arange(idx.shape[0])
    return ((logits.argmax(1) == lab).mean()
            + (logits.argmax(0) == lab).mean()) / 2


class ScMoGCNWrapper(MatchingScoreMixin):
    """scMoGNN matching wrapper (parity: match_modality/scmogcn.py:95-357)."""

    _DEFAULT_METRIC = "acc"
    _DISPLAY_ATTRS = ("latent_dim", "prop_layers")

    def __init__(self, args=None, layers=None, temp: float = 1.0,
                 latent_dim: int = 64, prop_layers: int = 4,
                 learning_rate: float = 6e-4, auxiliary_loss: int = 1,
                 seed: int = 0):
        if args is not None:
            prop_layers = getattr(args, "layers", prop_layers)
            learning_rate = getattr(args, "learning_rate", learning_rate)
            auxiliary_loss = int(getattr(args, "auxiliary_loss", auxiliary_loss))
            seed = getattr(args, "seed", seed)
        self.layers_spec = layers
        self.temp = temp
        self.latent_dim = latent_dim
        self.prop_layers = prop_layers
        self.learning_rate = learning_rate
        self.auxiliary_loss = auxiliary_loss
        self.seed = seed
        self.params = None

    def _default_layers(self, d1: int, d2: int):
        """The reference cite-task stack shape (example scmogcn.py:57-64),
        hidden width capped for small inputs."""
        h = min(512, max(32, 4 * self.latent_dim))
        L = self.latent_dim
        return (((d1, h, 0.25), (h, h, 0.25), (h, L)),
                ((d2, h, 0.2), (h, h, 0.2), (h, L)),
                ((L, h, 0.2), (h, d1)),
                ((L, h, 0.2), (h, d2)))

    def fit(self, x_mod1, x_mod2, x_mod1_test=None, x_mod2_test=None,
            epochs: int = 2000, batch_size: int = 4096,
            early_stopping: int = 20, alpha: float = 0.5, beta: float = 0.5):
        """Contrastive fit (parity: match_modality/scmogcn.py:157-275).

        Training cells are the first block; test cells (when given) join the
        propagation graphs but never the training batches.  The last
        ``batch_size`` training cells (after a seeded shuffle) are held out
        as the validation block whose matching accuracy drives best-epoch
        selection and early stopping."""
        x1 = as_numpy(x_mod1).astype(np.float32)
        x2 = as_numpy(x_mod2).astype(np.float32)
        train_size = len(x1)
        if x_mod1_test is not None:
            x1 = np.concatenate([x1, as_numpy(x_mod1_test).astype(np.float32)])
            x2 = np.concatenate([x2, as_numpy(x_mod2_test).astype(np.float32)])
        self.train_size = train_size
        hcell1 = expression_propagation(x1, layers=self.prop_layers,
                                        alpha=alpha, beta=beta)
        hcell2 = expression_propagation(x2, layers=self.prop_layers,
                                        alpha=alpha, beta=beta)
        self.feat_mod1 = H1 = jnp.stack(hcell1)      # (L-1, N, d1)
        self.feat_mod2 = H2 = jnp.stack(hcell2)
        d1, d2 = H1.shape[2], H2.shape[2]
        spec = self.layers_spec or self._default_layers(d1, d2)
        self.net = ScMoGCN(layers=tuple(tuple(tuple(s) for s in st)
                                        for st in spec), temp=self.temp)
        key = jax.random.key(self.seed)
        dummy = (jnp.zeros((2, d1)), jnp.zeros((2, d2)))
        params = {"model": self.net.init({"params": key, "dropout": key},
                                         *dummy,
                                         method=self.net.init_all)["params"],
                  "wt1": jnp.zeros(self.prop_layers - 1),
                  "wt2": jnp.zeros(self.prop_layers - 1)}
        tx = optax.adamw(self.learning_rate)
        opt_state = tx.init(params)
        net, aux, lr = self.net, self.auxiliary_loss, self.learning_rate
        # reference split: random perm of train cells, last BATCH_SIZE = val
        bs = min(batch_size, max(2, math.floor(train_size / 2)))
        rng_np = np.random.default_rng(self.seed)
        idx = rng_np.permutation(train_size)
        train_idx, val_idx = idx[:-bs], idx[-bs:]
        n_steps = max(1, len(train_idx) // bs)
        # whole fit (minibatch steps, val scoring, best tracking, early stop)
        # as one dispatch — see _match_train_run
        (self.params, opt_state, best_val, best_epoch, ran,
         loss) = _match_train_run(params, opt_state, H1, H2,
                                  jnp.asarray(train_idx),
                                  jnp.asarray(val_idx), key, epochs, net=net,
                                  lr=lr, aux=aux, n_steps=n_steps, bs=bs,
                                  early_stopping=early_stopping)
        ran = int(ran)
        if ran < epochs:
            logger.info("scMoGNN-match early stopped at epoch %d", ran - 1)
        logger.info("scMoGNN-match best val %.4f at epoch %d (%d epochs, "
                    "final loss %.5f)", float(best_val), int(best_epoch), ran,
                    float(loss))
        self.wt = [self.params["wt1"], self.params["wt2"]]
        return self

    # -- inference (parity: match_modality/scmogcn.py:277-357) ------------
    def _combine(self, idx):
        return propagation_layer_combination(
            self.feat_mod1, self.feat_mod2, jnp.asarray(idx),
            self.params["wt1"], self.params["wt2"])

    def predict(self, idx, enhance: bool = False, batch1=None, batch2=None,
                threshold_quantile: float = 0.95):
        m1, m2 = self._combine(idx)
        if not enhance:
            return np.asarray(self.net.apply({"params": self.params["model"]},
                                             m1, m2))
        e1, e2 = self.net.apply({"params": self.params["model"]}, m1, m2,
                                method=self.net.encode)
        idx = np.asarray(idx)
        if batch1 is None:
            batch1 = np.zeros(len(idx), dtype=int)
            batch2 = np.zeros(len(idx), dtype=int)
        else:
            batch1, batch2 = np.asarray(batch1)[idx], np.asarray(batch2)[idx]
        return batch_separated_bipartite_matching(batch1, batch2,
                                                  np.asarray(e1), np.asarray(e2),
                                                  threshold_quantile)

    def score(self, idx, labels1=None, labels2=None, labels_matrix=None,
              enhance: bool = False, batch1=None, batch2=None,
              threshold_quantile: float = 0.95):
        if not enhance:
            logits = self.predict(idx)
            backward = float((logits.argmax(0) == np.asarray(labels1)).mean())
            forward = float((logits.argmax(1) == np.asarray(labels2)).mean())
            return (forward + backward) / 2
        matrix = self.predict(idx, enhance, batch1, batch2, threshold_quantile)
        labels_matrix = as_numpy(labels_matrix)
        return float((matrix * labels_matrix).sum() / labels_matrix.shape[0])

    def predict_matching(self, x1=None, x2=None, batch1=None, batch2=None,
                         threshold_quantile: float = 0.995) -> np.ndarray:
        """Matching matrix over the fitted test block (the example-facing
        convenience around ``predict(enhance=True)``)."""
        idx = np.arange(self.train_size, self.feat_mod1.shape[1])
        if len(idx) == 0:
            idx = np.arange(self.train_size)
        return self.predict(idx, enhance=True, batch1=batch1, batch2=batch2,
                            threshold_quantile=threshold_quantile)


# reference helper name kept importable (match_modality/scmogcn.py:41)
cell_feature_propagation = expression_propagation

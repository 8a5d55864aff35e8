"""scMoGNN v2 joint embedding (parity: dance/modules/multi_modality/
joint_embedding/scmogcnv2.py:933-1213 — the file's operative second half).

The v2 recipe trains the full scMoGNN GNN trunk encode-only over the
concatenated-modality cell-feature graph with a *structured latent*:
columns [0, ct_dim) form a cell-type space (supervised by an auxiliary
``c_decoder`` CE head and a ``cc_decoder`` cell-cycle MSE head,
scmogcnv2.py:1069-1070), columns [shared_start, -2) a shared space, and the
last two the phase slot.  The decoder reconstructs both modality blocks
from ``[emb[:, :ct_dim], emb[:, shared_start:-2], one_hot(batch)]``
(scmogcnv2.py:1048-1059); training runs on cell minibatches with
degree-weighted feature sampling (0.6 rate, :1023), best-validation
selection, early stopping and lr decay after epoch 150 (:1091-1102).  The
joint embedding is ``[emb[:, :ct_dim], emb[:, shared_start:-2]]`` (:1167).

(The reference's ``embed`` method at :927-930 is dimensionally inconsistent
dead code — ``cc_decoder`` is Linear(47, 20) but is applied to a 2-column
slice — so ``predict`` here follows the operative :1167 path.)

TPU design: the sampled subgraph is two on-device gathers into a dense
(batch × sampled-features) block — see predict_modality/scmogcn.py — and the
whole train step is one jitted program.
"""

from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from dance_tpu.modules.multi_modality.predict_modality.scmogcn import (
    HeteroExpnGraph, ScMoGCN as _Trunk, build_hetero_graph)
from dance_tpu.settings import logger
from dance_tpu.typing import LogLevel
from dance_tpu.utils.wrappers import as_numpy


def propagation_layer_combination(X, idx, wt, from_logits: bool = True):
    """Softmax-weighted layer combination (parity: scmogcnv2.py:625-633)."""
    wt = jnp.asarray(wt)
    if from_logits:
        wt = jax.nn.softmax(wt, -1)
    x = 0
    for i in range(wt.shape[0]):
        x = x + wt[i] * jnp.asarray(X[i])[jnp.asarray(idx)]
    return x


class _ScMoGCNv2Net(nn.Module):
    """GNN trunk encode + structured-latent decoder + auxiliary heads
    (parity: scmogcnv2.py:636-931)."""

    feature_size: int
    out_size: int                 # feat1 + feat2 reconstruction target
    n_ct: int
    phase_dim: int = 2
    hidden_size: int = 14
    conv_layers: int = 4
    readout_layers: int = 1
    ct_dim: int = 20
    shared_start: int = 45
    model_dropout: float = 0.2
    edge_dropout: float = 0.3

    def setup(self):
        self.trunk = _Trunk(out_size=1, feature_size=self.feature_size,
                            hidden_size=self.hidden_size,
                            conv_layers=self.conv_layers,
                            model_dropout=self.model_dropout,
                            edge_dropout=self.edge_dropout)
        dec_hid = self.ct_dim + (self.latent_dim - self.shared_start - 2)
        self.decoder = [nn.Dense(dec_hid)
                        for _ in range(self.readout_layers - 1)] + \
            [nn.Dense(self.out_size)]
        self.c_decoder = nn.Dense(self.n_ct)
        self.cc_decoder = nn.Dense(self.phase_dim)
        self.drop = nn.Dropout(self.model_dropout)

    @property
    def latent_dim(self) -> int:
        return self.hidden_size * self.conv_layers

    def encode(self, g: HeteroExpnGraph, deterministic: bool = True):
        return self.trunk.encode(g, deterministic)

    def decode(self, h, deterministic: bool = True):
        for lin in self.decoder[:-1]:
            h = self.drop(nn.gelu(lin(h)), deterministic=deterministic)
        return self.decoder[-1](h)

    def structured(self, emb, batch_onehot):
        """[emb[:, :ct], emb[:, ss:-2], one_hot(batch)] (scmogcnv2.py:1048)."""
        return jnp.concatenate([emb[:, :self.ct_dim],
                                emb[:, self.shared_start:-2], batch_onehot], 1)

    def __call__(self, g: HeteroExpnGraph, batch_onehot,
                 deterministic: bool = True):
        emb = self.encode(g, deterministic)
        out = self.decode(self.structured(emb, batch_onehot), deterministic)
        return emb, out, self.c_decoder(emb[:, :self.ct_dim]), \
            self.cc_decoder(emb[:, :self.ct_dim])


# module-level jits with the (hashable, frozen) flax module as a static arg:
# compiled programs survive across fit() calls and wrapper instances, where a
# fit-local @jax.jit closure would retrace+recompile every fit.  Big arrays
# enter as ARGUMENTS: closing over device arrays embeds them as constants in
# the relay's compile payload (HTTP 413).  The optimizer is rebuilt inside
# the trace; inject_hyperparams reads learning_rate/weight_decay from
# opt_state.hyperparams, so the construction-time values are placeholders.
@partial(jax.jit, static_argnames=("net", "f1", "f2", "weight_decay"))
def _v2_epoch_steps(params, opt_state, x_dense, yj, bf1, ctj, phj,
                    cell_idx_mat, feat_idx_mat, rngs, *, net, f1, f2,
                    weight_decay):
    """One dispatch per epoch: the epoch's minibatch steps run as a lax.scan
    over host-pre-sampled (cell, feature) index stacks."""
    tx = optax.inject_hyperparams(optax.adamw)(learning_rate=1e-3,
                                               weight_decay=weight_decay)

    def body(carry, xs):
        params, opt_state = carry
        cell_idx, feat_idx, rng = xs
        w = x_dense[cell_idx][:, feat_idx]
        sub = HeteroExpnGraph(
            f2c=w, c2f=w.T, pw=None,
            deg_c=(w != 0).sum(1).astype(jnp.float32),
            deg_f=(w != 0).sum(0).astype(jnp.float32), deg_pw=None,
            feature_ids=feat_idx.astype(jnp.int32),
            cell_ids=jnp.ones(w.shape[0], jnp.int32), cell_feats=None,
            batch_feats=None)

        def loss_fn(p):
            emb, out, ct_logits, cc_pred = net.apply(
                {"params": p}, sub, bf1[cell_idx], deterministic=False,
                rngs={"dropout": rng})
            l1 = ((out[:, :f1] - yj[cell_idx, :f1]) ** 2).mean()
            l2 = ((out[:, -f2:] - yj[cell_idx, -f2:]) ** 2).mean()
            l3 = optax.softmax_cross_entropy_with_integer_labels(
                ct_logits, ctj[cell_idx]).mean()
            l5 = ((cc_pred - phj[cell_idx]) ** 2).mean()
            return 0.5 * l1 + 0.5 * l2 + l3 + l5

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state), loss

    (params, opt_state), losses = jax.lax.scan(
        body, (params, opt_state), (cell_idx_mat, feat_idx_mat, rngs))
    return params, opt_state, losses.sum()


def _v2_train_run(params, opt_state, g, x_dense, yj, bf1, ctj, phj, train_idx,
                  val_idx, p_feat, key, epochs, lr0, *, net, f1, f2,
                  weight_decay, n_steps: int, bs: int, n_samp: int,
                  early_stopping: int, lr_decay: float):
    """The whole validation-selected sampled fit as ONE dispatch.

    Per epoch inside a lax.while_loop: device-side cell shuffle, Gumbel
    top-k weighted feature sampling WITHOUT replacement (the device analog of
    ``rng.choice(p=deg)``), the epoch's minibatch scan, a full-graph val
    loss, best-params tracking, the reference early-stop rule and the
    epoch>150 lr decay — replacing a per-epoch dispatch + scalar pull over
    the axon relay."""
    epochs = jnp.asarray(epochs, jnp.int32)
    logp = jnp.log(jnp.maximum(p_feat, 1e-20))

    def sample_feats(rng):
        gumbel = -jnp.log(-jnp.log(
            jax.random.uniform(rng, logp.shape, minval=1e-20, maxval=1.0)))
        return jax.lax.top_k(logp + gumbel, n_samp)[1].astype(jnp.int32)

    carry0 = dict(params=params, opt=opt_state, epoch=jnp.int32(0),
                  stop=jnp.bool_(False), best_val=jnp.float32(jnp.inf),
                  best_epoch=jnp.int32(0), best_params=params,
                  lr=jnp.float32(lr0), loss=jnp.float32(0),
                  val=jnp.float32(0))

    def cond(c):
        return (c["epoch"] < epochs) & (~c["stop"])

    def body(c):
        e = c["epoch"]
        ekey = jax.random.fold_in(key, e)
        perm = jax.random.permutation(ekey, train_idx)[:n_steps * bs]
        cell_idx_mat = perm.reshape(n_steps, bs)
        step_ids = jnp.arange(n_steps) + e * 100003
        feat_idx_mat = jax.vmap(
            lambda s: sample_feats(jax.random.fold_in(ekey, s)))(step_ids)
        rngs = jax.vmap(lambda s: jax.random.fold_in(key, s))(step_ids)
        opt = c["opt"]
        opt = opt._replace(hyperparams={**opt.hyperparams,
                                        "learning_rate": c["lr"]})
        params, opt, total = _v2_epoch_steps(
            c["params"], opt, x_dense, yj, bf1, ctj, phj, cell_idx_mat,
            feat_idx_mat, rngs, net=net, f1=f1, f2=f2,
            weight_decay=weight_decay)
        val = _v2_val_loss(params, g, yj, bf1, val_idx, net=net, f1=f1, f2=f2)
        better = val < c["best_val"]
        pick = lambda new, old: jax.tree_util.tree_map(
            lambda a, b: jnp.where(better, a, b), new, old)
        best_epoch = jnp.where(better, e, c["best_epoch"])
        stop = (e > early_stopping) & (e - best_epoch >= early_stopping)
        lr = jnp.where(e > 150, c["lr"] * lr_decay, c["lr"])
        return dict(params=params, opt=opt, epoch=e + 1, stop=stop,
                    best_val=jnp.minimum(val, c["best_val"]),
                    best_epoch=best_epoch,
                    best_params=pick(params, c["best_params"]), lr=lr,
                    loss=total, val=val)

    c = jax.lax.while_loop(cond, body, carry0)
    return (c["best_params"], c["opt"], c["best_val"], c["best_epoch"],
            c["epoch"], c["loss"], c["lr"])


_v2_train_run = partial(jax.jit, static_argnames=(
    "net", "f1", "f2", "weight_decay", "n_steps", "bs", "n_samp",
    "early_stopping", "lr_decay"))(_v2_train_run)


@partial(jax.jit, static_argnames=("net", "f1", "f2"))
def _v2_val_loss(params, g, yj, bf1, idx, *, net, f1, f2):
    emb, out, _, _ = net.apply({"params": params}, g, bf1)
    l1 = ((out[idx, :f1] - yj[idx, :f1]) ** 2).mean()
    l2 = ((out[idx, -f2:] - yj[idx, -f2:]) ** 2).mean()
    return jnp.sqrt(0.5 * l1 + 0.5 * l2)


class ScMoGCNWrapperV2:
    """v2 wrapper (parity: scmogcnv2.py:933-1213)."""

    _DISPLAY_ATTRS = ("hidden_size", "conv_layers")

    def __init__(self, args=None, hidden_size: int = 14, conv_layers: int = 4,
                 ct_dim: int = 20, shared_start: int = 45,
                 learning_rate: float = 1e-2, weight_decay: float = 1e-5,
                 lr_decay: float = 0.99, early_stopping: int = 10,
                 node_sampling_rate: float = 0.6, seed: int = 0):
        if args is not None:
            hidden_size = getattr(args, "hidden_size", hidden_size)
            conv_layers = getattr(args, "conv_layers", conv_layers)
            learning_rate = getattr(args, "learning_rate", learning_rate)
            weight_decay = getattr(args, "weight_decay", weight_decay)
            lr_decay = getattr(args, "lr_decay", lr_decay)
            early_stopping = getattr(args, "early_stopping", early_stopping)
            seed = getattr(args, "seed", seed)
        if hidden_size * conv_layers < shared_start + 3:
            raise ValueError("latent too small: hidden_size*conv_layers must "
                             "exceed shared_start + 2")
        self.hidden_size = hidden_size
        self.conv_layers = conv_layers
        self.ct_dim = ct_dim
        self.shared_start = shared_start
        self.learning_rate = learning_rate
        self.weight_decay = weight_decay
        self.lr_decay = lr_decay
        self.early_stopping = early_stopping
        self.node_sampling_rate = node_sampling_rate
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

    def fit(self, x_mod1, x_mod2, cell_type=None, train_labels=None,
            batch_label=None, phase_score=None, epochs: int = 500,
            batch_size: int = 5000):
        """v2 fit (parity: scmogcnv2.py:948-1104).

        ``train_labels`` accepts the reference 4-list
        ``[cell_type_codes, batch_codes, _, phase_score]``; the keyword form
        (``cell_type``/``batch_label``/``phase_score``) is equivalent."""
        x1 = as_numpy(x_mod1).astype(np.float32)
        x2 = as_numpy(x_mod2).astype(np.float32)
        if train_labels is not None:
            ct_codes = np.asarray(train_labels[0], np.int64)
            batch_label = train_labels[1]
            phase_score = train_labels[3]
            n_ct = int(ct_codes.max()) + 1
        else:
            names, ct_codes = np.unique(as_numpy(cell_type), return_inverse=True)
            n_ct = len(names)
        n = len(x1)
        feat1, feat2 = x1.shape[1], x2.shape[1]
        x = np.concatenate([x1, x2], axis=1)
        if batch_label is None:
            batch_codes = np.zeros(n, np.int64)
        else:
            _, batch_codes = np.unique(as_numpy(batch_label), return_inverse=True)
        n_batches = int(batch_codes.max()) + 1
        if phase_score is None:
            phase_score = np.zeros((n, 2), np.float32)
        phase_score = as_numpy(phase_score).astype(np.float32)

        # "no_bsr": auto dense/CSR — the sampled fit gathers dense blocks, and
        # the per-epoch full-graph validation forward runs as MXU matmuls when
        # the density dispatch picks dense (3.7 s -> 45 ms at bench density).
        # The device graph (~170 MB dense pair) is cached across fits by
        # content hash: rebuilding + re-uploading it per fit costs seconds of
        # jittery relay traffic against ~125 ms/epoch of training
        import hashlib
        cache_key = (x.shape, hashlib.md5(np.ascontiguousarray(x)).hexdigest())
        if getattr(self, "_graph_cache_key", None) == cache_key:
            g = self._graph_cache
        else:
            g = build_hetero_graph(x, use_bsr="no_bsr")
            self._graph_cache_key, self._graph_cache = cache_key, g
        self.net = _ScMoGCNv2Net(
            feature_size=g.n_feats, out_size=feat1 + feat2, n_ct=n_ct,
            phase_dim=phase_score.shape[1], hidden_size=self.hidden_size,
            conv_layers=self.conv_layers, ct_dim=self.ct_dim,
            shared_start=self.shared_start)
        self._feat12 = (feat1, feat2)
        key = jax.random.key(self.seed)
        bf1 = jax.nn.one_hot(jnp.asarray(batch_codes), n_batches)
        self.params = self.net.init({"params": key, "dropout": key}, g,
                                    bf1)["params"]
        self._lr = self.learning_rate
        tx = optax.inject_hyperparams(optax.adamw)(
            learning_rate=self._lr, weight_decay=self.weight_decay)
        opt_state = tx.init(self.params)
        net = self.net
        from dance_tpu.ops.sparse import DenseAdj
        x_dense = g.f2c.mat if isinstance(g.f2c, DenseAdj) else jnp.asarray(x)
        yj = x_dense
        ctj = jnp.asarray(ct_codes, jnp.int32)
        phj = jnp.asarray(phase_score)
        f1, f2 = feat1, feat2

        rng_np = np.random.default_rng(self.seed)
        idx = rng_np.permutation(n)
        train_idx = idx[:max(1, int(n * 0.9))]
        val_idx = jnp.asarray(idx[int(n * 0.9):]) if n >= 10 else jnp.asarray(idx)
        bs = min(batch_size, len(train_idx))
        n_samp = max(1, int(self.node_sampling_rate * g.n_feats))
        deg_f = np.asarray(g.deg_f)
        p_feat = jnp.asarray(deg_f / max(deg_f.sum(), 1e-12), jnp.float32)
        n_steps = max(1, len(train_idx) // bs)
        (self.params, opt_state, best_val, best_epoch, ran, loss,
         self._lr) = _v2_train_run(
            self.params, opt_state, g, x_dense, yj, bf1, ctj, phj,
            jnp.asarray(train_idx), val_idx, p_feat, key, epochs, self._lr,
            net=net, f1=f1, f2=f2, weight_decay=self.weight_decay,
            n_steps=n_steps, bs=bs, n_samp=n_samp,
            early_stopping=self.early_stopping, lr_decay=self.lr_decay)
        ran = int(ran)
        if ran < epochs:
            logger.info("scMoGNN-v2 early stopped at epoch %d", ran - 1)
        logger.info("scMoGNN-v2 best val %.5f at epoch %d (%d epochs, final "
                    "loss %.5f)", float(best_val), int(best_epoch), ran,
                    float(loss))
        self._lr = float(self._lr)
        self._cache = (g, bf1)
        return self

    def predict(self, x=None):
        """Joint embedding [emb[:, :ct], emb[:, ss:-2]] (scmogcnv2.py:1167)."""
        g, _ = self._cache
        emb = self.net.apply({"params": self.params}, g, method=self.net.encode)
        return np.asarray(jnp.concatenate(
            [emb[:, :self.ct_dim], emb[:, self.shared_start:-2]], 1))

    def score(self, x, y, *, score_func=None, return_pred: bool = False,
              metric: str = "clustering", batch=None, **kwargs):
        from dance_tpu.utils.metrics import (integration_openproblems_evaluate,
                                             labeled_clustering_evaluate)
        emb = self.predict()
        y = as_numpy(y)
        if metric == "openproblems":
            scores = integration_openproblems_evaluate(emb, y, batch, **kwargs)
            return (scores, emb) if return_pred else scores["final_scores"]
        scores = labeled_clustering_evaluate(emb, y,
                                             n_clusters=len(np.unique(y)))
        return (scores, emb) if return_pred else scores["dance_nmi"]


# the reference import path exposes the operative wrapper under both names
ScMoGCNWrapper = ScMoGCNWrapperV2

__all__ = ["ScMoGCNWrapper", "ScMoGCNWrapperV2", "propagation_layer_combination"]

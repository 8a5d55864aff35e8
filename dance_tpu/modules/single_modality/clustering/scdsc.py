"""scDSC: SDCN-style AE + GCN fusion with ZINB, TPU-native.

Parity target: dance/modules/single_modality/clustering/scdsc.py. The deep AE
(3 encoder + 3 latent + 3 decoder layers) is fused layer-by-layer into a GCN
stack via the sigma-mixing rule; training optimizes bcl·BCE(q,p) + cl·KL(pred,p)
+ rl·MSE + zl·ZINB with ARI-based snapshot selection every 10 epochs.
"""

from functools import partial
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
import scipy.sparse as sp

from dance_tpu.modules.base import BaseClusteringMethod, NNPretrain
from dance_tpu.nn.zinb_ae import disp_act, mean_act
from dance_tpu.ops.pallas_kernels import unpermute
from dance_tpu.ops.segment import spmm
from dance_tpu.ops.sparse import CSRMatrix, csr_from_scipy
from dance_tpu.settings import logger
from dance_tpu.transforms import AnnDataTransform, Compose, SaveRaw, SetConfig
from dance_tpu.transforms.graph import NeighborGraph
from dance_tpu.typing import Any, LogLevel, Optional
from dance_tpu.utils.loss import soft_assign, target_distribution, zinb_nll
from dance_tpu.utils.wrappers import as_numpy


class _AE(nn.Module):
    dims: Tuple[int, ...]  # (enc1, enc2, enc3, z1, z2, z3, dec1, dec2, dec3)
    n_input: int

    def setup(self):
        e1, e2, e3, z1, z2, z3, d1, d2, d3 = self.dims
        self.enc = [nn.Dense(d) for d in (e1, e2, e3)]
        self.zs = [nn.Dense(d) for d in (z1, z2, z3)]
        self.dec = [nn.Dense(d) for d in (d1, d2, d3)]
        self.out = nn.Dense(self.n_input)

    def __call__(self, x):
        tra = []
        h = x
        for layer in self.enc:
            h = nn.relu(layer(h))
            tra.append(h)
        zl = []
        for layer in self.zs:
            h = nn.relu(layer(h)) if layer is not self.zs[-1] else layer(h)
            zl.append(h)
        z1, z2, z3 = zl
        h = z3
        for layer in self.dec:
            h = nn.relu(layer(h))
        dec_h3 = h
        x_bar = self.out(h)
        return x_bar, tra[0], tra[1], tra[2], z3, z2, z1, dec_h3


class ScDSCModel(nn.Module):
    """Fused AE + GCN network (parity: scdsc.py:328)."""

    n_input: int
    n_clusters: int
    sigma: float = 1.0
    dims: Tuple[int, ...] = (512, 256, 256, 256, 128, 32, 256, 256, 512)
    v: float = 1.0

    def setup(self):
        e1, e2, e3, z1, z2, z3, d1, d2, d3 = self.dims
        self.ae = _AE(self.dims, self.n_input)
        self.gnn = [nn.Dense(d, use_bias=False,
                             kernel_init=nn.initializers.glorot_uniform())
                    for d in (e1, e2, e3, z1, z2, z3, self.n_clusters)]
        self.dec_mean = nn.Dense(self.n_input)
        self.dec_disp = nn.Dense(self.n_input)
        self.dec_pi = nn.Dense(self.n_input)
        self.cluster_layer = self.param("cluster_layer",
                                        nn.initializers.xavier_normal(),
                                        (self.n_clusters, z3))

    def __call__(self, x, adj: CSRMatrix):
        x_bar, tra1, tra2, tra3, z3, z2, z1, dec_h3 = self.ae(x)
        s = self.sigma
        h = nn.relu(spmm(adj, self.gnn[0](x)))
        for gl, mix in zip(self.gnn[1:6], (tra1, tra2, tra3, z1, z2)):
            h = nn.relu(spmm(adj, gl((1 - s) * h + s * mix)))
        h = spmm(adj, self.gnn[6]((1 - s) * h + s * z3))
        predict = nn.softmax(h, axis=1)
        mean = mean_act(self.dec_mean(dec_h3))
        disp = disp_act(self.dec_disp(dec_h3))
        pi = nn.sigmoid(self.dec_pi(dec_h3))
        q = soft_assign(z3, self.cluster_layer, self.v)
        return x_bar, q, predict, z3, mean, disp, pi


class ScDSC(NNPretrain, BaseClusteringMethod):
    """scDSC wrapper (parity: scdsc.py:33)."""

    _DISPLAY_ATTRS = ("n_clusters", "sigma")

    def __init__(self, pretrain_path: Optional[str] = None, sigma: float = 1.0,
                 n_enc_1: int = 512, n_enc_2: int = 256, n_enc_3: int = 256,
                 n_dec_1: int = 256, n_dec_2: int = 256, n_dec_3: int = 512,
                 n_z1: int = 256, n_z2: int = 128, n_z3: int = 32,
                 n_clusters: int = 10, n_input: int = 100, v: float = 1.0,
                 device: str = "auto", seed: int = 0,
                 reference_protocol: bool = False):
        super().__init__()
        self.pretrain_path = pretrain_path
        self.n_clusters = n_clusters
        self.sigma = sigma
        self.v = v
        self.seed = seed
        # reference_protocol=True reproduces the reference's exact cluster-
        # layer initialization: xavier-random centers (scdsc.py:407-408),
        # which the SDCN recipe replaces with kmeans on the pretrained
        # embedding. Used by the parity lane's match-mode rows to prove
        # implementation equivalence separately from protocol superiority.
        self.reference_protocol = reference_protocol
        self.model = ScDSCModel(n_input=n_input, n_clusters=n_clusters, sigma=sigma,
                                dims=(n_enc_1, n_enc_2, n_enc_3, n_z1, n_z2, n_z3,
                                      n_dec_1, n_dec_2, n_dec_3), v=v)
        self.params = None

    @staticmethod
    def preprocessing_pipeline(n_top_genes: int = 2000, n_neighbors: int = 50,
                               log_level: LogLevel = "INFO"):
        return Compose(
            AnnDataTransform("sc.pp.filter_genes", min_counts=3),
            AnnDataTransform("sc.pp.filter_cells", min_counts=1),
            AnnDataTransform("sc.pp.normalize_per_cell"),
            AnnDataTransform("sc.pp.log1p"),
            AnnDataTransform("sc.pp.highly_variable_genes", min_mean=0.0125, max_mean=4,
                             flavor="cell_ranger", min_disp=0.5,
                             n_top_genes=n_top_genes, subset=True),
            AnnDataTransform("sc.pp.filter_genes", min_counts=1),
            AnnDataTransform("sc.pp.filter_cells", min_counts=1),
            SaveRaw(),
            AnnDataTransform("sc.pp.normalize_total"),
            AnnDataTransform("sc.pp.log1p"),
            AnnDataTransform("sc.pp.scale"),
            NeighborGraph(n_neighbors=n_neighbors, channel=None),
            SetConfig({"feature_channel": ["NeighborGraph", None, None, "n_counts"],
                       "feature_channel_type": ["obsp", "X", "raw_X", "obs"],
                       "label_channel": "Group"}),
            log_level=log_level,
        )

    # --- training ---------------------------------------------------------

    @partial(jax.jit, static_argnames=("self",))
    def _pretrain_epoch(self, params, opt_state, x, idx, key):
        """Scanned minibatch AE pretrain epoch (the reference's DataLoader
        batching, scdsc.py pretrain); ``idx`` is the (nb, bs) shuffled index
        matrix so activation memory is bounded by the batch."""
        def loss_fn(params, bx):
            x_bar, *_ = self.model.apply({"params": params}, bx,
                                         method=lambda m, xx: m.ae(xx))
            return jnp.mean((x_bar - bx) ** 2)

        def step(carry, batch_idx):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(params, x[batch_idx])
            updates, opt_state = self._pt_tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), loss

        (params, opt_state), losses = jax.lax.scan(step, (params, opt_state),
                                                   idx)
        return params, opt_state, losses.mean()

    @partial(jax.jit, static_argnames=("self", "batch_size"))
    def _pretrain_epochs(self, params, opt_state, x, keys, batch_size: int):
        from dance_tpu.utils.batch import epoch_batches

        def epoch(carry, ek):
            params, opt_state = carry
            idx = epoch_batches(ek, x.shape[0], batch_size)
            params, opt_state, loss = self._pretrain_epoch(params, opt_state,
                                                           x, idx, ek)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(epoch, (params, opt_state),
                                                   keys)
        return params, opt_state, losses

    def pretrain(self, x, batch_size: int = 256, epochs: int = 200, lr: float = 1e-3):
        x = jnp.asarray(x, jnp.float32)
        self._pt_tx = optax.adam(lr)
        opt_state = self._pt_tx.init(self.params)
        keys = jax.random.split(jax.random.key(self.seed), epochs)
        bs = min(batch_size, x.shape[0])
        # one compiled scan for the whole pretrain (per-epoch dispatch costs
        # more than the epoch's compute over the axon relay)
        self.params, opt_state, losses = self._pretrain_epochs(
            self.params, opt_state, x, keys, bs)
        losses = np.asarray(losses)
        for epoch in range(0, epochs, 100):
            logger.info("AE pretrain epoch %d, MSE %.6f", epoch, losses[epoch])

    @partial(jax.jit, static_argnames=("self",))
    def _refresh(self, params, x, adj):
        """DEC target refresh as one dispatch (q + target distribution)."""
        _, q, *_ = self.model.apply({"params": params}, x, adj)
        return q, target_distribution(q)

    @partial(jax.jit, static_argnames=("self",))
    def _train_step(self, params, opt_state, x, adj, x_raw, sf, p, bcl, cl, rl, zl):
        def loss_fn(params):
            x_bar, q, pred, z, mean, disp, pi = self.model.apply({"params": params}, x,
                                                                 adj)
            eps = 1e-10
            bce = -(p * jnp.log(q + eps) + (1 - p) * jnp.log(1 - q + eps)).mean()
            ce = jnp.sum(p * (jnp.log(p + eps) - jnp.log(pred + eps)), axis=1).mean()
            re = jnp.mean((x_bar - x) ** 2)
            zinb = zinb_nll(x_raw, mean, disp, pi, scale_factor=sf[:, None])
            return bcl * bce + cl * ce + rl * re + zl * zinb

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = self._tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def fit(self, inputs: Tuple, y=None, lr: float = 1e-3, epochs: int = 300,
            bcl: float = 0.1, cl: float = 0.01, rl: float = 1.0, zl: float = 0.1,
            pt_epochs: int = 200, pt_batch_size: int = 256, pt_lr: float = 1e-3,
            use_bsr="auto", bsr_block: int = 128):
        """``use_bsr=True`` runs the 7 per-layer GCN aggregations through the
        Pallas block-sparse SpMM after RCM-banding the kNN graph; inputs are
        permuted once on the host and ``q`` is un-permuted on read. The
        default ``"auto"`` engages it on TPU when the banded tiling is dense
        enough to win (ops.pallas_kernels.resolve_use_bsr)."""
        adj, x, x_raw, n_counts = inputs
        x = as_numpy(x).astype(np.float32)
        x_raw = as_numpy(x_raw)
        n_counts = as_numpy(n_counts)
        if self.params is None:
            adj_csr = sp.csr_matrix(as_numpy(adj) if not sp.issparse(adj) else adj)
            adj_csr = adj_csr + sp.eye(adj_csr.shape[0], format="csr", dtype=np.float32)
            deg = np.asarray(adj_csr.sum(1)).ravel()
            dinv = 1.0 / np.sqrt(np.maximum(deg, 1e-12))
            adj_n = sp.diags(dinv) @ adj_csr @ sp.diags(dinv)
            from dance_tpu.ops.pallas_kernels import resolve_use_bsr
            use_bsr = resolve_use_bsr(use_bsr, adj_n, bsr_block)
            self._perm = None
            if use_bsr:
                from dance_tpu.ops.pallas_kernels import bsr_with_rcm
                self._perm, self.adj = bsr_with_rcm(adj_n, block=bsr_block)
            else:
                self.adj = csr_from_scipy(adj_n)
            self.params = self.model.init(jax.random.key(self.seed),
                                          jnp.asarray(x[:1]), self.adj)["params"]
        if getattr(self, "_perm", None) is not None:
            x, x_raw, n_counts = x[self._perm], x_raw[self._perm], n_counts[self._perm]
        self._pretrain(x, batch_size=pt_batch_size, epochs=pt_epochs, lr=pt_lr,
                       force_pretrain=True)

        # initialize cluster centers from KMeans on the pretrained AE embedding
        # (SDCN recipe; the reference leaves them at random init, which stalls
        # — reference_protocol=True keeps the model.init xavier-random
        # centers to reproduce that behavior, scdsc.py:407-408)
        if not self.reference_protocol:
            from dance_tpu.ops.cluster import kmeans
            z3 = self.model.apply({"params": self.params}, jnp.asarray(x),
                                  method=lambda m, xx: m.ae(xx))[4]
            centers = kmeans(z3, self.n_clusters, n_init=10,
                             seed=self.seed).centers
            self.params = dict(self.params)
            self.params["cluster_layer"] = jnp.asarray(centers)

        xj = jnp.asarray(x)
        xr = jnp.asarray(x_raw, jnp.float32)
        n_counts = n_counts.astype(np.float64)
        sf = jnp.asarray(n_counts / np.median(n_counts), jnp.float32)
        self._tx = optax.adam(lr)
        opt_state = self._tx.init(self.params)

        if y is not None:
            # permuted comparison labels: q comes back in the (possibly
            # RCM-permuted) training order; ARI is order-consistent
            y_arr = np.asarray(y).ravel()
            if getattr(self, "_perm", None) is not None:
                y_arr = y_arr[self._perm]
            n_true = int(y_arr.max()) + 1
            y_dev = jnp.asarray(y_arr, jnp.int32)
        else:
            n_true = 0
            y_dev = jnp.zeros((xj.shape[0],), jnp.int32)
        # whole DEC protocol (refresh every 10 + best-ARI selection, no tol
        # stop in the reference scdsc) as ONE dispatch — nn/dec_loop.py
        from dance_tpu.nn.dec_loop import run_dec_loop
        labels0 = jnp.zeros((xj.shape[0],), jnp.int32)
        # adj rides in data (NOT a closure): a closure would bake this fit's
        # adjacency into the cached compilation as a constant
        data = dict(x=xj, xr=xr, sf=sf, adj=self.adj,
                    w=jnp.asarray([bcl, cl, rl, zl], jnp.float32))
        (self.params, opt_state), out = run_dec_loop(
            self._dec_refresh, self._dec_train, (self.params, opt_state),
            data, labels0, y_dev, jax.random.key(self.seed), epochs,
            -1.0,  # never tol-stop
            n_true=n_true, batch_size=1, update_interval=10,
            static_token=(float(lr),))
        q_dev = out["best_q"] if n_true else out["q"]
        self.q = unpermute(getattr(self, "_perm", None), np.asarray(q_dev))
        return self

    def _dec_refresh(self, state, data):
        params, _ = state
        q, p = self._refresh(params, data["x"], data["adj"])
        return q, q, p

    def _dec_train(self, state, p, key, data, batch_size: int):
        params, opt_state = state
        bcl, cl, rl, zl = data["w"]
        params, opt_state, loss = self._train_step(
            params, opt_state, data["x"], data["adj"], data["xr"], data["sf"],
            p, bcl, cl, rl, zl)
        return (params, opt_state), loss

    def predict_proba(self, x: Optional[Any] = None) -> np.ndarray:
        return np.asarray(self.q)

    def predict(self, x: Optional[Any] = None) -> np.ndarray:
        return np.asarray(self.q).argmax(1)

"""scTAG: TAG graph-conv ZINB autoencoder + DEC, TPU-native.

Parity target: dance/modules/single_modality/clustering/sctag.py (two TAGConv
encoders on the sym-normalized cell kNN graph, inner-product adjacency decoder
+ MLP ZINB decoder, pretrain with w_a·adj + w_x·ZINB (+ optional dist loss),
then DEC stage adding w_c·KL).
"""

from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
import scipy.sparse as sp

from dance_tpu.modules.base import BaseClusteringMethod, NNPretrain
from dance_tpu.nn.gnn import TAGConv
from dance_tpu.nn.zinb_ae import disp_act, mean_act
from dance_tpu.ops.pallas_kernels import unpermute
from dance_tpu.ops.sparse import CSRMatrix, csr_from_scipy
from dance_tpu.settings import logger
from dance_tpu.transforms import AnnDataTransform, CellPCA, Compose, SaveRaw, SetConfig
from dance_tpu.transforms.graph import NeighborGraph
from dance_tpu.typing import Any, LogLevel, Optional, Tuple
from dance_tpu.utils.loss import (binary_ce_logits, cluster_kl_loss, dist_loss,
                                  soft_assign, target_distribution, zinb_nll)
from dance_tpu.utils.wrappers import as_numpy


class _ScTAGNet(nn.Module):
    in_dim: int
    hidden_dim: int
    latent_dim: int
    dec_dims: Tuple[int, ...]
    k: int
    dropout: float

    def setup(self):
        self.encoder1 = TAGConv(self.hidden_dim, k=self.k)
        self.encoder2 = TAGConv(self.latent_dim, k=self.k)
        self.dec_stack = [nn.Dense(d) for d in self.dec_dims]
        self.dec_mean = nn.Dense(self.in_dim)
        self.dec_disp = nn.Dense(self.in_dim)
        self.dec_pi = nn.Dense(self.in_dim)

    def encode(self, adj: CSRMatrix, x):
        h = nn.relu(self.encoder1(adj, x))
        return self.encoder2(adj, h)

    def decode(self, z):
        h = z
        for layer in self.dec_stack:
            h = nn.relu(layer(h))
        return mean_act(self.dec_mean(h)), disp_act(self.dec_disp(h)), nn.sigmoid(
            self.dec_pi(h))

    def __call__(self, adj: CSRMatrix, x):
        z = self.encode(adj, x)
        adj_logits = nn.sigmoid(z @ z.T)
        mean, disp, pi = self.decode(z)
        return z, adj_logits, mean, disp, pi


class ScTAG(NNPretrain, BaseClusteringMethod):
    """scTAG model (parity: sctag.py:32)."""

    _DISPLAY_ATTRS = ("n_clusters", "k", "hidden_dim", "latent_dim")

    def __init__(self, n_clusters: int, k: int = 3, hidden_dim: int = 128,
                 latent_dim: int = 15, dec_dim=None, dropout: float = 0.2,
                 device: str = "auto", alpha: float = 1.0,
                 pretrain_path: Optional[str] = None, seed: int = 0):
        super().__init__()
        self.n_clusters = n_clusters
        self.k = k
        self.hidden_dim = hidden_dim
        self.latent_dim = latent_dim
        self.dec_dim = tuple(dec_dim or (128, 256, 512))
        self.dropout = dropout
        self.alpha = alpha
        self.pretrain_path = pretrain_path
        self.seed = seed
        self.params = None
        self.mu = None
        self.net = None

    @staticmethod
    def preprocessing_pipeline(n_top_genes: int = 3000, n_components: int = 50,
                               n_neighbors: int = 15, log_level: LogLevel = "INFO"):
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
            CellPCA(n_components=n_components),
            NeighborGraph(n_neighbors=n_neighbors, n_pcs=n_components),
            SetConfig({"feature_channel": ["NeighborGraph", None, None, "n_counts"],
                       "feature_channel_type": ["obsp", "X", "raw_X", "obs"],
                       "label_channel": "Group"}),
            log_level=log_level,
        )

    def init_model(self, adj, x):
        adj = sp.csr_matrix(adj)
        adj = adj + sp.eye(adj.shape[0], format="csr", dtype=np.float32)
        deg = np.asarray(adj.sum(1)).ravel()
        dinv = 1.0 / np.sqrt(np.maximum(deg, 1e-12))
        adj_n = sp.diags(dinv) @ adj @ sp.diags(dinv)
        if getattr(self, "_use_bsr", False):
            from dance_tpu.ops.pallas_kernels import bsr_from_scipy
            self.adj_n = bsr_from_scipy(adj_n, block=self._bsr_block)
        else:
            self.adj_n = csr_from_scipy(adj_n)
        self.adj_dense = jnp.asarray((adj > 0).todense().astype(np.float32))
        self.net = _ScTAGNet(in_dim=x.shape[1], hidden_dim=self.hidden_dim,
                             latent_dim=self.latent_dim, dec_dims=self.dec_dim,
                             k=self.k, dropout=self.dropout)
        self.params = self.net.init(jax.random.key(self.seed), self.adj_n,
                                    jnp.asarray(x[:, :], jnp.float32))["params"]

    @partial(jax.jit, static_argnames=("self", "epochs", "use_cluster",
                                       "use_dist", "collect_q"))
    def _run(self, params, mu, opt_state, adj, x, x_raw, sf, adj_target,
             w_a, w_x, w_c, w_d, min_dist, max_dist, *, epochs: int,
             use_cluster: bool, use_dist: bool, collect_q: bool):
        """Whole training stage as ONE compiled ``lax.scan`` program.

        Per epoch (matching the reference's loop order): encode with the
        current params, form the DEC target ``p`` (stop-gradient), then one
        Adam step on the joint loss. The pre-update soft assignments ``q``
        are stacked as scan outputs when ``collect_q`` (they feed the
        host-side ARI snapshot selection after training) — this keeps the
        whole DEC stage device-resident instead of one dispatch + one
        device→host ARI sync per epoch."""

        def body(carry, _):
            params, mu, opt_state, _, _ = carry
            z_pre = self.net.apply({"params": params}, adj, x,
                                   method=self.net.encode)
            q_pre = soft_assign(z_pre, mu, self.alpha)
            p = jax.lax.stop_gradient(target_distribution(q_pre))

            def loss_fn(theta):
                params, mu = theta
                z, _, mean, disp, pi = self.net.apply({"params": params}, adj, x)
                # adjacency BCE from raw logits (one softplus per element;
                # the net's sigmoid output is unused here, pruned by XLA)
                a_loss = binary_ce_logits(z @ z.T, adj_target)
                x_loss = zinb_nll(x_raw, mean, disp, pi,
                                  scale_factor=sf[:, None])
                loss = w_a * a_loss + w_x * x_loss
                if use_dist:
                    # static gate: the O(n²) pairwise term and its backward
                    # only enter the graph when w_d > 0
                    loss = loss + w_d * dist_loss(z, min_dist, max_dist)
                if use_cluster:
                    q = soft_assign(z, mu, self.alpha)
                    loss = loss + w_c * cluster_kl_loss(p, q)
                return loss

            loss, grads = jax.value_and_grad(loss_fn)((params, mu))
            updates, opt_state = self._tx.update(grads, opt_state, (params, mu))
            (params, mu) = optax.apply_updates((params, mu), updates)
            out = (loss, q_pre) if collect_q else (loss, ())
            return (params, mu, opt_state, q_pre, z_pre), out

        z0 = jnp.zeros((x.shape[0], self.latent_dim), x.dtype)
        q0 = jnp.zeros((x.shape[0], self.n_clusters), x.dtype)
        (params, mu, opt_state, q_last, z_last), (losses, qs) = jax.lax.scan(
            body, (params, mu, opt_state, q0, z0), None, length=epochs)
        return params, mu, opt_state, q_last, z_last, losses, qs

    @partial(jax.jit, static_argnames=("self",))
    def _encode(self, params, adj, x):
        return self.net.apply({"params": params}, adj, x, method=self.net.encode)

    def pretrain(self, adj, x, x_raw, n_counts, *, epochs: int = 1000,
                 info_step: int = 10, lr: float = 5e-4, w_a: float = 0.3,
                 w_x: float = 1.0, w_d: float = 0.0, min_dist: float = 0.5,
                 max_dist: float = 20.0, force_pretrain: bool = False):
        if self.net is None:
            self.init_model(adj, x)
        x = jnp.asarray(x, jnp.float32)
        x_raw = jnp.asarray(x_raw, jnp.float32)
        sf = jnp.asarray(n_counts / np.median(np.asarray(n_counts)), jnp.float32)
        self._tx = optax.adam(lr)
        mu = jnp.zeros((self.n_clusters, self.latent_dim), jnp.float32)
        opt_state = self._tx.init((self.params, mu))
        self.params, mu, _, _, _, losses, _ = self._run(
            self.params, mu, opt_state, self.adj_n, x, x_raw, sf,
            self.adj_dense, w_a, w_x, 0.0, w_d, min_dist, max_dist,
            epochs=epochs, use_cluster=False, use_dist=w_d > 0,
            collect_q=False)
        losses = np.asarray(losses)
        for epoch in range(0, epochs, max(info_step * 10, 1)):
            logger.info("Pretrain epoch %d, loss %.6f", epoch, losses[epoch])

    def fit(self, inputs: Tuple, y=None, *, epochs: int = 300,
            pretrain_epochs: int = 200, lr: float = 5e-4, w_a: float = 0.3,
            w_x: float = 1.0, w_c: float = 1.5, w_d: float = 0.0, info_step: int = 1,
            max_dist: float = 20.0, min_dist: float = 0.5,
            force_pretrain: bool = False, use_bsr="auto",
            bsr_block: int = 128):
        """``use_bsr=True`` RCM-bands the cell kNN graph and runs both TAGConv
        encoders' k-hop aggregations through the Pallas block-sparse SpMM
        (inputs permuted once; ``q``/``z`` un-permuted on read). The default
        ``"auto"`` engages it on TPU when the banded tiling is dense enough
        to win (ops.pallas_kernels.resolve_use_bsr)."""
        from dance_tpu.ops.pallas_kernels import resolve_use_bsr
        adj, x, x_raw, n_counts = inputs
        adj = adj if sp.issparse(adj) else as_numpy(adj)
        x, x_raw, n_counts = (as_numpy(i) for i in (x, x_raw, n_counts))
        use_bsr = resolve_use_bsr(use_bsr, sp.csr_matrix(adj), bsr_block)
        self._use_bsr, self._bsr_block = use_bsr, bsr_block
        self._perm = None
        if use_bsr:
            from dance_tpu.ops.pallas_kernels import rcm_reorder
            perm, adj = rcm_reorder(sp.csr_matrix(adj))
            self._perm = np.asarray(perm)
            x, x_raw, n_counts = x[perm], x_raw[perm], n_counts[perm]
        self._pretrain(adj, x, x_raw, n_counts, epochs=pretrain_epochs, lr=lr, w_a=w_a,
                       w_x=w_x, w_d=w_d, min_dist=min_dist, max_dist=max_dist,
                       force_pretrain=force_pretrain)
        x = jnp.asarray(x, jnp.float32)
        x_raw = jnp.asarray(x_raw, jnp.float32)
        sf = jnp.asarray(n_counts / np.median(n_counts), jnp.float32)

        from dance_tpu.ops.cluster import kmeans
        latent = self._encode(self.params, self.adj_n, x)
        res = kmeans(latent, self.n_clusters, n_init=20, seed=self.seed)
        self.mu = jnp.asarray(res.centers)

        self._tx = optax.adam(lr)
        opt_state = self._tx.init((self.params, self.mu))
        y_cmp = (None if y is None
                 else np.asarray(y)[self._perm] if self._perm is not None
                 else np.asarray(y))
        # one compiled program for the whole DEC stage; the per-epoch
        # pre-update q snapshots come back stacked for ARI selection
        self.params, self.mu, opt_state, q_last, z_last, _, qs = self._run(
            self.params, self.mu, opt_state, self.adj_n, x, x_raw, sf,
            self.adj_dense, w_a, w_x, w_c, w_d, min_dist, max_dist,
            epochs=epochs, use_cluster=True, use_dist=w_d > 0,
            collect_q=y is not None)
        self.q, self.z = q_last, z_last
        if y is not None and epochs > 0:
            from sklearn.metrics import adjusted_rand_score
            # ARI on the permuted ordering (labels permuted to match)
            qs = np.asarray(qs)
            labels = qs.argmax(2)
            aris = [adjusted_rand_score(y_cmp, labels[e])
                    for e in range(labels.shape[0])]
            self.q = qs[int(np.argmax(aris))]
        self.q = unpermute(self._perm, np.asarray(self.q))
        self.z = unpermute(self._perm, np.asarray(self.z))
        return self

    def predict_proba(self, x: Optional[Any] = None) -> np.ndarray:
        return np.asarray(self.q)

    def predict(self, x: Optional[Any] = None) -> np.ndarray:
        return np.asarray(self.q).argmax(1)


# reference decoder names (sctag.py:433,:475): the adjacency decoder is the
# inner-product head and DecoderX the MLP ZINB decoder, both folded into
# _ScTAGNet; aliases keep the reference import surface.
DecoderAdj = _ScTAGNet
DecoderX = _ScTAGNet

"""scMoGNN for joint embedding (parity: dance/modules/multi_modality/
joint_embedding/scmogcn.py:92 + scmogcnv2.py:325).

Runs the bipartite cell-feature GNN over the concatenated modalities and
supervises the cell representation with an auxiliary cell-type head (the v2
recipe), exposing the penultimate layer as the joint embedding.
"""

from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from dance_tpu.modules.base import BaseRegressionMethod
from dance_tpu.modules.multi_modality.predict_modality.scmogcn import (
    ScMoGCN as _Trunk, build_hetero_graph)
from dance_tpu.settings import logger
from dance_tpu.typing import LogLevel, Optional
from dance_tpu.utils.wrappers import as_numpy


class _JENet(nn.Module):
    """Full scMoGNN trunk -> z embedding -> cell-type head."""

    z_dim: int
    n_ct: int
    hidden: int
    n_layers: int
    feature_size: int

    def setup(self):
        self.trunk = _Trunk(out_size=self.z_dim, feature_size=self.feature_size,
                            hidden_size=self.hidden, conv_layers=self.n_layers)
        self.head = nn.Dense(self.n_ct)

    def embed(self, g):
        return self.trunk(g)

    def __call__(self, g):
        z = self.trunk(g)
        return z, self.head(nn.relu(z))


class ScMoGCNWrapper(BaseRegressionMethod):

    _DISPLAY_ATTRS = ("hidden", "n_layers")

    def __init__(self, args=None, hidden: int = 64, n_layers: int = 2,
                 z_dim: int = 32, seed: int = 0):
        self.hidden = hidden
        self.n_layers = n_layers
        self.z_dim = z_dim
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

    @partial(jax.jit, static_argnames=("self", "has_labels"))
    def _step(self, params, opt_state, g, ct, rng, has_labels):
        def loss_fn(params):
            emb, logits = self.net.apply({"params": params}, g,
                                         rngs={"dropout": rng})
            loss = 1e-4 * jnp.mean(emb ** 2)  # mild embedding regularization
            if has_labels:
                loss = loss + optax.softmax_cross_entropy_with_integer_labels(
                    logits, ct).mean()
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = self._tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def fit(self, x_mod1, x_mod2, cell_type=None, epochs: int = 150,
            lr: float = 1e-2, use_bsr="auto", bsr_block: int = 128):
        x = np.concatenate([as_numpy(x_mod1), as_numpy(x_mod2)], axis=1).astype(
            np.float32)
        # graph cached across fits by content hash (see predict-modality fit)
        import hashlib
        cache_key = (x.shape, str(use_bsr), bsr_block,
                     hashlib.md5(np.ascontiguousarray(x)).hexdigest())
        if getattr(self, "_graph_cache_key", None) == cache_key:
            g = self._graph_cache
        else:
            g = build_hetero_graph(x, use_bsr=use_bsr, bsr_block=bsr_block)
            self._graph_cache_key, self._graph_cache = cache_key, g
        has_labels = cell_type is not None
        if has_labels:
            names, ct = np.unique(as_numpy(cell_type), return_inverse=True)
            n_ct = len(names)
        else:
            ct, n_ct = np.zeros(len(x), np.int64), 1
        self.net = _JENet(z_dim=self.z_dim, n_ct=n_ct, hidden=self.hidden,
                          n_layers=self.n_layers, feature_size=g.n_feats)
        key = jax.random.key(self.seed)
        self.params = self.net.init({"params": key, "dropout": key}, g)["params"]
        self._tx = optax.adam(lr)
        opt_state = self._tx.init(self.params)
        ctj = jnp.asarray(ct, jnp.int32)
        for epoch in range(epochs):
            rng = jax.random.fold_in(key, epoch)
            self.params, opt_state, loss = self._step(self.params, opt_state, g,
                                                      ctj, rng, has_labels)
            if epoch % 50 == 0:
                logger.info("scMoGNN-JE epoch %d, loss %.5f", epoch, float(loss))
        self._cache = g
        return self

    def predict(self, x=None):
        return np.asarray(self.net.apply({"params": self.params}, self._cache,
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


# --------------------------------------------------------------------------
# reference-named propagation helpers (parity: joint_embedding/scmogcn.py:26-90)
# --------------------------------------------------------------------------

def propagation_layer_combination(X, idx, wt, from_logits: bool = True):
    """Learned softmax-weighted combination of per-layer cell embeddings
    (parity: scmogcn.py:26)."""
    wt = jnp.asarray(wt)
    if from_logits:
        wt = jax.nn.softmax(wt, -1)
    x = 0
    for i in range(wt.shape[0]):
        x = x + wt[i] * jnp.asarray(X[i])[jnp.asarray(idx)]
    return x


def cell_feature_propagation(g, alpha: float = 0.5, beta: float = 0.5,
                             cell_init: str = None, feature_init: str = "id",
                             device: str = None, layers: int = 3):
    """Alternating cell<->feature propagation with per-layer standardization
    (parity: scmogcn.py:37). ``g`` is the framework Graph built by
    :func:`~dance_tpu.transforms.graph.scmogcn_graph.construct_enhanced_feature_graph`
    (features first, cells after); returns the per-layer cell embeddings
    ``hcell[1:]`` as jnp arrays. Runs as dense/sparse matmuls on device."""
    import scipy.sparse as sp

    from dance_tpu.ops.sparse import csr_from_scipy, csr_matmat

    n_feat = int(g.info["num_genes"])
    n_cell = int(g.info["num_cells"])
    adj = sp.csr_matrix(g.adj)
    a_cf = csr_from_scipy(adj[n_feat:, :n_feat])  # cell <- feature
    a_fc = csr_from_scipy(adj[:n_feat, n_feat:])  # feature <- cell

    if feature_init is None:
        cell_feats = np.asarray(g.info["cell_node_features"])
        feature_x = jnp.zeros((n_feat, cell_feats.shape[1]), jnp.float32)
    elif feature_init == "id":
        feature_x = jnp.eye(n_feat, dtype=jnp.float32)
    else:
        raise NotImplementedError(
            f"Not implemented feature init feature {feature_init}.")
    if cell_init is None:
        cell_x = jnp.zeros((n_cell, feature_x.shape[1]), jnp.float32)
    else:
        cell_x = jnp.asarray(np.asarray(g.info["cell_node_features"]),
                             jnp.float32)

    def std(h):
        mean = h.mean()
        scale = jnp.where(mean != 0, h.std(), 1.0)
        return (h - mean) / jnp.maximum(scale, 1e-12)

    h_feature, h_cell = feature_x, cell_x
    hcell = []
    for _ in range(layers):
        h1_feature = std(csr_matmat(a_fc, h_cell))
        h1_cell = std(csr_matmat(a_cf, h_feature))
        h_feature = h_feature * alpha + h1_feature * (1 - alpha)
        h_cell = h_cell * beta + h1_cell * (1 - beta)
        h_feature = (h_feature - h_feature.mean()) / jnp.maximum(
            h_feature.std(), 1e-12)
        h_cell = (h_cell - h_cell.mean()) / jnp.maximum(h_cell.std(), 1e-12)
        hcell.append(h_cell)
    return hcell[1:]

"""scGNN 2.0: iterative multi-autoencoder EM imputation, TPU-native.

Parity target: dance/modules/single_modality/imputation/scgnn2.py (EM loop
alternating a feature AE (:338), a graph AE over the cell graph built from
the current embedding (:373), Louvain clustering on that graph (:138-232),
and per-cluster Cluster AEs warm-started from the feature AE whose
reconstructions form the next round's imputed matrix (:429, :821-880); the
cluster stage minimizes the reference "Celltype" objective
0.3·MSE + ||nonzero(x_dropout − recon)|| + 0.3·graph-regu + 0.1·celltype-regu
(loss_function_graph, :1298-1330)).

TPU design: the reference trains one Cluster AE per cluster sequentially;
here all clusters train SIMULTANEOUSLY under one vmapped scan over padded
fixed-size cluster batches — same math (padding rows carry zero loss weight),
one compiled program regardless of cluster count.
"""

from functools import partial
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
import scipy.sparse as sp

from dance_tpu.modules.base import BaseRegressionMethod
from dance_tpu.ops.cluster import louvain
from dance_tpu.ops.segment import spmm
from dance_tpu.ops.sparse import csr_from_scipy
from dance_tpu.settings import logger
from dance_tpu.transforms import (AnnDataTransform, CellwiseMaskData, Compose,
                                  FilterCellsScanpy, FilterGenesScanpy, SaveRaw,
                                  SetConfig)
from dance_tpu.typing import LogLevel, Optional
from dance_tpu.utils.wrappers import as_numpy


class _FeatureAE(nn.Module):
    """Feature AE (parity: Feature_AE, scgnn2.py:338); the Cluster AE shares
    this architecture (Cluster_AE subclasses it verbatim, :429).

    ``reference_protocol`` switches to the reference's exact parameterization:
    torch.nn.Linear init (kaiming-uniform kernels, uniform biases) and a ReLU
    output head (Feature_AE.decode, scgnn2.py:358) instead of softplus —
    under the 60-full-batch-step budget the init scale dominates how far the
    recon gets, so matching it is required for match-mode parity."""

    hidden: Tuple[int, ...] = (512, 128)
    reference_protocol: bool = False

    @nn.compact
    def __call__(self, x):
        from dance_tpu.nn.zinb_ae import TorchDense
        dense = TorchDense if self.reference_protocol else nn.Dense
        out_act = nn.relu if self.reference_protocol else nn.softplus
        h = x
        for d in self.hidden:
            h = nn.relu(dense(d)(h))
        z = h
        for d in self.hidden[-2::-1]:
            h = nn.relu(dense(d)(h))
        x_hat = out_act(dense(x.shape[-1])(h))
        return z, x_hat


class _GraphAE(nn.Module):
    z_dim: int = 128

    variational: bool = False

    @nn.compact
    def __call__(self, adj, z, rng=None):
        h = nn.relu(spmm(adj, nn.Dense(self.z_dim)(z)))
        mu = spmm(adj, nn.Dense(self.z_dim)(h))
        if not self.variational:
            return mu
        lv = spmm(adj, nn.Dense(self.z_dim)(h))
        if rng is None:
            return mu
        # reference_protocol: the reference's VGAE stays in training mode for
        # the whole EM loop, so the embedding fed downstream is the SAMPLED
        # latent — with its std = exp(logvar) quirk (scgnn2.py:448-452, no
        # 0.5 factor), doubling the injected noise
        return mu + jax.random.normal(rng, mu.shape) * jnp.exp(lv)


# --- jitted stages ----------------------------------------------------------
#
# Module-level jits keyed on STRUCTURALLY-hashable statics (the flax module —
# a frozen dataclass — plus lr/epoch counts) instead of methods static on
# ``self``: a fresh ScGNN2 per fit (the norm in sweeps and benchmarks) then
# reuses the compiled programs instead of recompiling three whole-stage scans.


@partial(jax.jit, static_argnames=("ae", "lr", "n_epochs"))
def _feature_stage_scan(ae, lr, params, x, mask, n_epochs: int):
    """The whole feature-AE stage as ONE dispatched program: the per-step
    compute (~130 GFLOP full-batch fwd+bwd) is microseconds-cheap next to a
    relay dispatch, so a Python epoch loop was 88% of the EM wall clock
    (benchmarks/profile_scgnn2.py)."""
    tx = optax.adam(lr)

    def step(carry, _):
        params, opt_state = carry

        def loss_fn(params):
            _, x_hat = ae.apply({"params": params}, x)
            # mask may be a scalar 1.0 (no-mask fit: saves uploading an
            # all-ones matrix over the relay); the denominator is then the
            # full element count, same as an explicit ones mask
            denom = mask.sum() if jnp.ndim(mask) else mask * x.size
            return jnp.sum(mask * (x - x_hat) ** 2) / jnp.maximum(denom, 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state), loss

    (params, _), losses = jax.lax.scan(step, (params, tx.init(params)), None,
                                       length=n_epochs)
    z, x_hat = ae.apply({"params": params}, x)
    return params, z, x_hat, losses[-1]


@partial(jax.jit, static_argnames=("ae", "lr", "n_epochs", "sample"))
def _graph_stage_scan(ae, lr, params, adj, z, gkey, n_epochs: int,
                      sample: bool):
    """Graph-AE stage as one scan, including the final embedding forward;
    ``sample`` threads the reference-protocol per-epoch rng (sampled VGAE
    latent) through as scan xs."""
    tx = optax.adam(lr)
    keys = jax.random.split(gkey, n_epochs) if sample else jnp.zeros(
        (n_epochs, 0))

    def step(carry, key):
        params, opt_state = carry
        rng = key if sample else None

        def loss_fn(params):
            z_g = ae.apply({"params": params}, adj, z, rng)
            return jnp.mean((z_g - z) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state), loss

    (params, _), losses = jax.lax.scan(step, (params, tx.init(params)), keys)
    z_g = ae.apply({"params": params}, adj, z,
                   jax.random.fold_in(gkey, n_epochs + 1) if sample else None)
    return params, z_g, losses[-1]


@partial(jax.jit, static_argnames=("ae", "lr", "n_epochs", "l1"))
def _cluster_ae_train(ae, lr, stacked_params, xr_pad, xd_pad, row_mask,
                      gw_pad, n_epochs: int, l1: bool):
    """Train every cluster's AE simultaneously (vmapped over clusters).

    Per-cluster objective follows loss_function_graph "Celltype"
    (scgnn2.py:1314-1328): 0.3·sum MSE + frobenius of the nonzero
    (x_dropout − recon) residual + 0.3·graph-weighted row MSE +
    0.1·celltype-weighted row MSE (weights = column sums of the
    within-cluster adjacency / all-ones matrices — the matmuls in the
    reference reduce to exactly these row weights).
    """
    tx = optax.adam(lr)

    def cluster_loss(params, xr, xd, m, gw):
        _, recon = ae.apply({"params": params}, xr)
        se = (recon - xr) ** 2 * m[:, None]
        mse_rows = se.sum(1)
        bce = mse_rows.sum()
        nz = (xd - recon) * (xd != 0) * m[:, None]
        nonzero_regu = jnp.sqrt(jnp.maximum(jnp.sum(nz ** 2), 1e-12))
        csize = m.sum()
        graph_regu = jnp.sum(gw * mse_rows)
        celltype_regu = csize * mse_rows.sum()
        loss = 0.3 * bce + nonzero_regu + 0.3 * graph_regu + 0.1 * celltype_regu
        if l1:
            # the reference's "Celltype" branch adds an UNSCALED L1 over
            # every model parameter (train_handler, scgnn2.py:392-398:
            # `loss = loss + 1 * l1 + 0 * l2`) — this term dominates the
            # objective and shrinks the cluster AE toward zero output,
            # which is the documented source of the reference's high
            # imputation error; the default protocol drops it
            loss = loss + sum(jnp.abs(leaf).sum()
                              for leaf in jax.tree_util.tree_leaves(params))
        return loss

    def one_cluster(params, xr, xd, m, gw):
        opt_state = tx.init(params)

        def step(carry, _):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(cluster_loss)(params, xr, xd, m, gw)
            updates, opt_state = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), loss

        (params, _), losses = jax.lax.scan(step, (params, opt_state), None,
                                           length=n_epochs)
        _, recon = ae.apply({"params": params}, xr)
        return recon, losses[-1]

    return jax.vmap(one_cluster)(stacked_params, xr_pad, xd_pad, row_mask,
                                 gw_pad)


@partial(jax.jit, static_argnames=("n",))
def _scatter_members(recon_pad, idx_mat, row_mask, n: int):
    """Un-pad the per-cluster reconstructions back to cell order. Every
    cell belongs to exactly one cluster, so a masked scatter-add writes
    each row once (padding slots contribute zeros to row 0)."""
    flat_idx = idx_mat.reshape(-1)
    flat = (recon_pad * row_mask[:, :, None]).reshape(flat_idx.shape[0], -1)
    return jnp.zeros((n, flat.shape[1]), flat.dtype).at[flat_idx].add(flat)


class ScGNN2(BaseRegressionMethod):
    """scGNN 2.0 model (parity: scgnn2.py:22)."""

    _DISPLAY_ATTRS = ("total_epoch", "feature_epoch", "graph_epoch")

    def __init__(self, total_epoch: int = 3, feature_epoch: int = 100,
                 graph_epoch: int = 50, cluster_epoch: int = 50, n_clusters: int = 10,
                 k: int = 10, hidden: Tuple[int, ...] = (512, 128), lr: float = 1e-3,
                 cluster_lr: float = 1e-3, regu_strength: float = 0.9,
                 max_clusters: int = 30, seed: int = 0,
                 reference_protocol: bool = False, **kwargs):
        # reference_protocol=True reproduces the reference's variational
        # graph stage: the downstream embedding is sampled from the VGAE
        # posterior (training mode, std = exp(logvar)) instead of the mean
        # path — the documented source of the parity gap (parity.csv scgnn2)
        self.reference_protocol = reference_protocol
        self.total_epoch = total_epoch
        self.feature_epoch = feature_epoch
        self.graph_epoch = graph_epoch
        self.cluster_epoch = cluster_epoch
        self.n_clusters = n_clusters
        self.k = k
        self.hidden = tuple(hidden)
        self.lr = lr
        self.cluster_lr = cluster_lr
        self.regu_strength = regu_strength
        self.max_clusters = max_clusters
        self.seed = seed

    @staticmethod
    def preprocessing_pipeline(min_cells: float = 0.1, mask: bool = True,
                               distr: str = "exp", mask_rate: float = 0.1,
                               seed: Optional[int] = None,
                               log_level: LogLevel = "INFO"):
        transforms = [
            FilterGenesScanpy(min_cells=min_cells),
            FilterCellsScanpy(min_counts=1),
            SaveRaw(),
            AnnDataTransform("sc.pp.log1p"),
        ]
        if mask:
            transforms.append(CellwiseMaskData(distr=distr, mask_rate=mask_rate,
                                               seed=seed))
        transforms.append(SetConfig({
            "feature_channel": [None, "train_mask"] if mask else [None],
            "feature_channel_type": ["X", "layers"] if mask else ["X"],
            "label_channel": [None, None],
            "label_channel_type": ["X", "raw_X"]}))
        return Compose(*transforms, log_level=log_level)

    # --- cluster bookkeeping -------------------------------------------------

    def _cluster_labels(self, z, adj, n: int) -> np.ndarray:
        """Louvain communities on the embedding kNN graph with the reference's
        trimming (clusters <5 cells or >max_clusters collapse, scgnn2.py:229)."""
        from dance_tpu.ops.cluster import kmeans, louvain
        labels = np.asarray(louvain(adj, seed=self.seed))
        uniq, counts = np.unique(labels, return_counts=True)
        if len(uniq) < 2 or len(uniq) > self.max_clusters:
            k_cl = min(self.n_clusters, max(n // 10, 2))
            labels = np.asarray(kmeans(np.asarray(z), k_cl, n_init=3,
                                       seed=self.seed).labels)
        # trim: merge tiny clusters into the largest one
        uniq, counts = np.unique(labels, return_counts=True)
        tiny = uniq[counts < min(5, max(n // 20, 1))]
        if len(tiny) and len(uniq) - len(tiny) >= 1:
            labels = np.where(np.isin(labels, tiny), uniq[np.argmax(counts)], labels)
        # re-index consecutively
        _, labels = np.unique(labels, return_inverse=True)
        return labels

    def _cluster_ae_stage(self, f_params, x_recon, x_dropout, labels, adj):
        """Pad clusters to one fixed size, warm-start every cluster AE from the
        feature AE, train them all under one vmapped scan, and scatter the
        reconstructions back (parity: cluster_AE_handler, scgnn2.py:821-880)."""
        n = x_recon.shape[0]
        k_cl = int(labels.max()) + 1
        sizes = np.bincount(labels, minlength=k_cl)
        m = int(sizes.max())
        idx_mat = np.zeros((k_cl, m), np.int32)
        row_mask = np.zeros((k_cl, m), np.float32)
        adj_csr = adj.tocsr()
        gw = np.zeros((k_cl, m), np.float32)
        for c in range(k_cl):
            members = np.where(labels == c)[0]
            idx_mat[c, :len(members)] = members
            row_mask[c, :len(members)] = 1.0
            sub = adj_csr[members][:, members]
            gw[c, :len(members)] = np.asarray(sub.sum(0)).ravel()
        stacked = jax.tree_util.tree_map(
            lambda leaf: jnp.broadcast_to(leaf, (k_cl,) + leaf.shape), f_params)
        # x_recon / x_dropout live on device; pad-gather and the scatter back
        # run there too (pulling 2×(n, genes) to the host and re-uploading the
        # padded copies cost more relay time than the whole AE training)
        idx_j = jnp.asarray(idx_mat)
        xr_pad = jnp.asarray(x_recon)[idx_j]
        xd_pad = jnp.asarray(x_dropout)[idx_j]
        recon_pad, losses = _cluster_ae_train(
            self.feature_ae, self.cluster_lr, stacked, xr_pad, xd_pad,
            jnp.asarray(row_mask), jnp.asarray(gw),
            n_epochs=self.cluster_epoch, l1=self.reference_protocol)
        return _scatter_members(recon_pad, idx_j, jnp.asarray(row_mask), n)

    # --- EM loop --------------------------------------------------------------

    def fit(self, x, x_raw=None, mask=None):
        """``x`` is the log-normalized matrix the EM loop trains on (the
        reference's Feature/Graph/Cluster AEs also consume the normalized
        data, scgnn2.py:1123); ``x_raw`` is accepted for the shared
        imputation-fit signature and not used by this method."""
        from dance_tpu.ops.neighbors import knn_graph
        import scipy.sparse as sp

        x = as_numpy(x).astype(np.float32)
        n = x.shape[0]
        if mask is not None:
            mask_arr = as_numpy(mask).astype(np.float32)
            x_dropout = x * mask_arr  # observed entries only (reference x_dropout)
            mj = jnp.asarray(mask_arr)
        else:
            mask_arr = None
            x_dropout = x
            mj = jnp.float32(1.0)  # scalar: no 80 MB all-ones upload

        self.feature_ae = _FeatureAE(hidden=self.hidden,
                                     reference_protocol=self.reference_protocol)
        self.graph_ae = _GraphAE(z_dim=self.hidden[-1],
                                 variational=self.reference_protocol)
        key = jax.random.key(self.seed)
        f_params = self.feature_ae.init(key, jnp.asarray(x_dropout[:1]))["params"]
        g_params = None
        xd_j = jnp.asarray(x_dropout)  # uploaded once; EM stages stay on device

        def feature_stage(x_in, params, train_mask):
            params, z, x_hat, loss = _feature_stage_scan(
                self.feature_ae, self.lr, params, jnp.asarray(x_in),
                train_mask, self.feature_epoch)
            return params, z, x_hat, float(loss)

        def graph_stage(z, g_params, em):
            adj = knn_graph(np.asarray(z), min(self.k, n - 1),
                            mode="connectivity", include_self=False)
            adj_sl = adj + sp.eye(n, format="csr", dtype=np.float32)
            dinv = 1.0 / np.sqrt(np.maximum(np.asarray(adj_sl.sum(1)).ravel(), 1e-12))
            adj_n = csr_from_scipy(sp.diags(dinv) @ adj_sl @ sp.diags(dinv))
            if g_params is None:
                g_params = self.graph_ae.init(jax.random.fold_in(key, em), adj_n,
                                              z)["params"]
            gkey = jax.random.fold_in(key, 1000 + em)
            g_params, z_g, g_loss = _graph_stage_scan(
                self.graph_ae, self.lr, g_params, adj_n, z, gkey,
                self.graph_epoch, self.reference_protocol)
            return g_params, z_g, adj, float(g_loss)

        # pre-EM: feature AE on the observed matrix, then the first graph
        f_params, z, x_recon, f_loss = feature_stage(xd_j, f_params, mj)
        g_params, z_g, adj, g_loss = graph_stage(z, g_params, 0)

        labels = np.zeros(n, np.int64)
        x_imputed = x_recon
        for em in range(self.total_epoch):
            labels = self._cluster_labels(z_g, adj, n)
            x_imputed = self._cluster_ae_stage(f_params, x_recon, xd_j,
                                               labels, adj)
            # next round: feature AE retrains on the imputed matrix (EM "M" step)
            f_params, z, x_recon, f_loss = feature_stage(
                x_imputed, f_params, jnp.float32(1.0))
            g_params, z_g, adj, g_loss = graph_stage(z, g_params, em + 1)
            logger.info("EM round %d: %d clusters, recon %.5f graph %.5f", em,
                        int(labels.max()) + 1, f_loss, g_loss)

        imputed = np.asarray(x_imputed)
        if mask is None:
            # reference parity: ScGNN2.fit returns the fully imputed matrix
            # (scgnn2.py:67); without an observed-entry mask there is nothing
            # to splice back
            self.imputed = imputed
        else:
            out = x.copy()
            out[mask_arr == 0] = imputed[mask_arr == 0]
            self.imputed = out
        self.labels = labels
        return self

    def predict(self, x=None, mask=None):
        return self.imputed

    def score(self, true_expr, imputed_expr, mask=None, metric: str = "MSE",
              test_idx=None):
        true = as_numpy(true_expr).astype(np.float32)
        imp = as_numpy(imputed_expr).astype(np.float32)
        if mask is not None:
            m = as_numpy(mask).astype(bool)
            true, imp = true[m], imp[m]
        if metric == "MSE":
            return float(np.mean((np.log1p(true) - np.log1p(np.maximum(imp, 0))) ** 2))
        if metric == "PCC":
            return float(np.corrcoef(true.ravel(), imp.ravel())[0, 1])
        raise ValueError(f"Unknown metric {metric!r}")


# --------------------------------------------------------------------------
# reference-named graph/cluster utilities (parity: scgnn2.py:194-689)
# --------------------------------------------------------------------------

def calculateKNNgraphDistanceMatrixStatsSingleThread(featureMatrix,
                                                     distanceType="euclidean",
                                                     k=10):
    """Weighted kNN edge list, weight = 1/distance (parity: scgnn2.py:675);
    vectorized over all rows instead of the reference's per-row cdist."""
    from scipy.spatial.distance import cdist
    featureMatrix = np.asarray(featureMatrix)
    dist = cdist(featureMatrix, featureMatrix, distanceType)
    order = dist.argsort(axis=1)
    edge_list = []
    for i in range(featureMatrix.shape[0]):
        for j in order[i, 1:k + 1]:
            edge_list.append((i, int(j), 1.0 / (dist[i, j] + 1e-16)))
    return edge_list


def edgeList2edgeDict(edgeList, nodesize):
    """Adjacency dict-of-lists from an edge list (parity: scgnn2.py)."""
    graphdict = {i: [] for i in range(nodesize)}
    for edge in edgeList:
        graphdict[edge[0]].append(edge[1])
    return graphdict


def generateLouvainCluster(edgeList):
    """Louvain labels from a weighted edge list (parity: scgnn2.py:194);
    the igraph dependency is replaced by the first-party Louvain."""
    n = max(max(e[0], e[1]) for e in edgeList) + 1
    rows = [e[0] for e in edgeList]
    cols = [e[1] for e in edgeList]
    w = [e[2] if len(e) > 2 else 1.0 for e in edgeList]
    adj = sp.csr_matrix((w, (rows, cols)), shape=(n, n))
    adj = adj.maximum(adj.T)
    labels = louvain(adj, seed=0)
    return list(labels), len(set(labels))


def trimClustering(listResult, minMemberinCluster=5, maxClusterNumber=30):
    """Merge small/overflow clusters into one (parity: scgnn2.py:229)."""
    listResult = list(listResult)
    counts = {}
    for item in listResult:
        counts[item] = counts.get(item, 0) + 1
    size = len(set(listResult))
    change = {item for item in range(size)
              if counts.get(item, 0) < minMemberinCluster
              or item >= maxClusterNumber}
    return [maxClusterNumber if item in change else item for item in listResult]


def feature2adj(X_embed, neighborhood_factor, retain_weights):
    """kNN adjacency from an embedding (parity: scgnn2.py:650). Returns
    ``(adj, adj_train, edgeList)`` with self-loops cleared in adj_train."""
    n = X_embed.shape[0]
    k = (neighborhood_factor if neighborhood_factor > 1
         else round(n * neighborhood_factor))
    k = k - 1 if k == n else k
    edge_list = calculateKNNgraphDistanceMatrixStatsSingleThread(X_embed, k=k)
    rows = [e[0] for e in edge_list]
    cols = [e[1] for e in edge_list]
    if retain_weights:
        vals = [e[2] for e in edge_list]
    else:
        vals = np.ones(len(edge_list))
        # undirected 0/1 adjacency, like nx.from_dict_of_lists
    adj = sp.csr_matrix((vals, (rows, cols)), shape=(n, n))
    if not retain_weights:
        adj = ((adj + adj.T) > 0).astype(np.float64)
    adj_train = adj - sp.dia_matrix((adj.diagonal()[np.newaxis, :], [0]),
                                    shape=adj.shape)
    adj_train.eliminate_zeros()
    return adj, adj_train, edge_list


def normalize_features_dense(node_features_dense):
    """Row-sum normalize dense features; all-zero rows pass through
    (parity: scgnn2.py:622)."""
    assert isinstance(node_features_dense, np.ndarray), (
        f"Expected np matrix got {type(node_features_dense)}.")
    return node_features_dense / np.clip(
        node_features_dense.sum(1, keepdims=True), a_min=1, a_max=None)


def convert_adj_to_edge_index(adjacency_matrix):
    """(2, E) edge-index array from a dense adjacency (parity: scgnn2.py:631)."""
    assert isinstance(adjacency_matrix, np.ndarray), (
        f"Expected NumPy array got {type(adjacency_matrix)}.")
    height, width = adjacency_matrix.shape
    assert height == width, f"Expected square shape got = {adjacency_matrix.shape}."
    rows, cols = np.nonzero(adjacency_matrix)
    return np.stack([rows, cols])


def edgeList2edgeIndex(edgeList):
    """[(u, v), ...] pairs from a (u, v, w) edge list (parity: scgnn2.py:510)."""
    return [[i[0], i[1]] for i in edgeList]


def normalize_cell_cell_matrix(x):
    """Row-average normalization with masked zero rows (parity: scgnn2.py:726)."""
    x = np.asarray(x, dtype=np.float64)
    rowsum = x.sum(axis=1, keepdims=True)
    with np.errstate(divide="ignore", invalid="ignore"):
        factor = np.where(rowsum != 0, 1.0 / rowsum, 0.0)
    return factor * x


def generateCelltypeRegu(listResult):
    """Block-diagonal same-celltype indicator matrix (parity: scgnn2.py:733)."""
    labels = np.asarray(listResult)
    return (labels[:, None] == labels[None, :]).astype(np.float64)


def preprocess_graph(adj):
    """Symmetric normalization with self-loops, returned as our device CSR
    (parity: scgnn2.py:1191 — the reference returns a torch sparse tensor;
    use :func:`sparse_mx_to_torch_sparse_tensor` for torch interop)."""
    adj = sp.coo_matrix(adj)
    adj_ = adj + sp.eye(adj.shape[0])
    rowsum = np.asarray(adj_.sum(1)).ravel()
    dis = sp.diags(np.power(rowsum, -0.5))
    return csr_from_scipy(sp.csr_matrix(adj_.dot(dis).transpose().dot(dis)))

"""scHeteroNet: heterophily-aware GNN annotation with OOD detection.

Parity target: dance/modules/single_modality/cell_type_annotation/
scheteronet.py. The HeteroNet encoder concatenates one-hop and STRICT
two-hop GCN-normalized aggregations per layer (HetConv, :374-387; adjacency
construction :507-540), collects every layer's output with jumping-knowledge
concatenation (:541-575), and feeds the concatenated representation to both
the classifier head and an auxiliary ZINB decoder (:389-444). Training adds
a masked-view contrastive term (:281-287); OOD scoring is energy belief
propagation over the one-hop OR strict two-hop row-normalized adjacency
(:611-656). BatchNorm uses per-call batch statistics — exact for full-graph
training where the "batch" is always all nodes.
"""

from functools import partial
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
import scipy.sparse as sp

from dance_tpu.modules.base import BaseClassificationMethod
from dance_tpu.nn.zinb_ae import disp_act, mean_act
from dance_tpu.ops.segment import spmm
from dance_tpu.ops.sparse import CSRMatrix, csr_from_scipy
from dance_tpu.settings import logger
from dance_tpu.transforms import (AnnDataTransform, Compose, FilterCellsScanpy,
                                  FilterCellsType,
                                  HighlyVariableGenesLogarithmizedByTopGenes, Log1P,
                                  NormalizeTotal, SaveRaw, SetConfig, UpdateSizeFactors)
from dance_tpu.transforms.graph.heteronet_graph import HeteronetGraph
from dance_tpu.typing import LogLevel, Optional
from dance_tpu.utils.loss import zinb_nll
from dance_tpu.utils.wrappers import as_numpy


def _gcn_norm(adj: sp.spmatrix) -> sp.csr_matrix:
    """D^-1/2 A D^-1/2 without self loops (reference gcn_norm usage, :535)."""
    adj = sp.csr_matrix(adj)
    deg = np.asarray(adj.sum(1)).ravel()
    dinv = 1.0 / np.sqrt(np.maximum(deg, 1e-12))
    dinv[deg == 0] = 0.0
    return sp.diags(dinv) @ adj @ sp.diags(dinv)


def build_hop_adjacencies(adj: sp.spmatrix):
    """(normalized one-hop, normalized STRICT two-hop) without self loops
    (parity: HeteroNet.init_adj, scheteronet.py:507-540)."""
    a = sp.csr_matrix(adj)
    a.data[:] = 1.0
    a.setdiag(0)
    a.eliminate_zeros()
    a2 = a @ a
    a2.setdiag(0)
    a2 = a2 - a
    a2.data = np.where(a2.data > 0, 1.0, 0.0).astype(np.float32)
    a2.eliminate_zeros()
    return _gcn_norm(a), _gcn_norm(a2)


def contrastive_loss(z1, z2, temperature: float = 0.5):
    """InfoNCE between matched rows (parity: scheteronet.py:281-287)."""
    z1 = z1 / jnp.maximum(jnp.linalg.norm(z1, axis=-1, keepdims=True), 1e-12)
    z2 = z2 / jnp.maximum(jnp.linalg.norm(z2, axis=-1, keepdims=True), 1e-12)
    logits = z1 @ z2.T / temperature
    labels = jnp.arange(z1.shape[0])
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()


class _ZINBDecoder(nn.Module):
    """Parity: ZINBDecoder (scheteronet.py:389-444; dec_2 maps straight to
    n_dec_3 — the intermediate dec_3 layer is unused in the reference too)."""

    n_genes: int
    dec_dims: Tuple[int, ...] = (32, 64, 128)

    @nn.compact
    def __call__(self, z):
        h = nn.relu(nn.Dense(self.dec_dims[0])(z))
        h = nn.relu(nn.Dense(self.dec_dims[2])(h))
        return (mean_act(nn.Dense(self.n_genes)(h)),
                disp_act(nn.Dense(self.n_genes)(h)),
                nn.sigmoid(nn.Dense(self.n_genes)(h)))


class _FullBatchNorm(nn.Module):
    """Stateless batch norm: full-graph batches make per-call statistics exact
    (identical train/eval batch = all nodes), so no running averages needed."""

    @nn.compact
    def __call__(self, x):
        mean, var = x.mean(0), x.var(0)
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        return (x - mean) / jnp.sqrt(var + 1e-5) * scale + bias


class _HeteroNet(nn.Module):
    """HetConv stack + jumping-knowledge concat (parity: :465-575).

    Each layer maps h -> [A1 h ; A2 h] (dims double); every stage's output is
    concatenated for the final projection: last_dim = hidden*(2^(L+1)-1).
    """

    n_classes: int
    hidden: int = 64
    num_layers: int = 2
    dropout: float = 0.2
    use_bn: bool = True
    n_genes: int = 0

    def setup(self):
        self.feature_embed = nn.Dense(self.hidden)
        self.bns = [_FullBatchNorm() for _ in range(max(self.num_layers - 1, 0))]
        self.final_project = nn.Dense(self.n_classes)
        self.decoder = _ZINBDecoder(n_genes=self.n_genes)

    def embed(self, adj1: CSRMatrix, adj2: CSRMatrix, x, *, training: bool = False,
              rng=None):
        def drop(h, i):
            if not training or rng is None or self.dropout == 0.0:
                return h
            keep = jax.random.bernoulli(jax.random.fold_in(rng, i),
                                        1.0 - self.dropout, h.shape)
            return jnp.where(keep, h / (1.0 - self.dropout), 0.0)
        h = nn.relu(self.feature_embed(x))
        collected = [h]
        h = drop(h, 0)
        for i in range(self.num_layers):
            h = jnp.concatenate([spmm(adj1, h), spmm(adj2, h)], axis=1)
            if i != self.num_layers - 1:
                if self.use_bn:
                    h = self.bns[i](h)
                collected.append(h)
                h = drop(h, i + 1)
            else:
                h = drop(h, i + 1)
                collected.append(h)
        return jnp.concatenate(collected, axis=1)  # jumping knowledge 'cat'

    def zinb(self, h):
        return self.decoder(h)

    def __call__(self, adj1: CSRMatrix, adj2: CSRMatrix, x, *,
                 training: bool = False, rng=None):
        h = self.embed(adj1, adj2, x, training=training, rng=rng)
        return self.final_project(h), h


class scHeteroNet(BaseClassificationMethod):
    """scHeteroNet model (parity: scheteronet.py:576)."""

    _DISPLAY_ATTRS = ("hidden_channels", "num_layers")

    def __init__(self, d: int = 0, c: int = 0, edge_index=None, num_nodes: int = 0,
                 hidden_channels: int = 64, num_layers: int = 2, dropout: float = 0.2,
                 use_bn: bool = True, device: str = "auto",
                 min_loss: float = np.inf, seed: int = 0):
        self.hidden_channels = hidden_channels
        self.num_layers = num_layers
        self.dropout = dropout
        self.use_bn = use_bn
        self.seed = seed
        self.params = None

    @staticmethod
    def preprocessing_pipeline(log_level: LogLevel = "INFO"):
        return Compose(
            FilterCellsType(),
            AnnDataTransform("sc.pp.filter_genes", min_counts=3),
            FilterCellsScanpy(min_counts=1),
            HighlyVariableGenesLogarithmizedByTopGenes(n_top_genes=4000,
                                                       flavor="cell_ranger"),
            SaveRaw(),
            NormalizeTotal(),
            UpdateSizeFactors(),
            Log1P(),
            HeteronetGraph(),
            SetConfig({"label_channel": "cell_type"}),
            log_level=log_level,
        )

    @partial(jax.jit, static_argnames=("self", "use_zinb", "use_cl"))
    def _step(self, params, opt_state, adj1, adj2, x, x_raw, sf, y, mask,
              zinb_weight, cl_weight, mask_ratio, key, use_zinb: bool,
              use_cl: bool):
        def loss_fn(params):
            logits, h = self.net.apply({"params": params}, adj1, adj2, x,
                                       training=True, rng=jax.random.fold_in(key, 1))
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, jnp.maximum(y, 0))
            loss = (ce * mask).sum() / jnp.maximum(mask.sum(), 1.0)
            if use_zinb:
                mean, disp, pi = self.net.apply({"params": params}, h,
                                                method=self.net.zinb)
                nll = zinb_nll(x_raw, mean, disp, pi, scale_factor=sf[:, None],
                               reduce=False).sum(1)
                loss = loss + zinb_weight * (nll * mask).sum() / jnp.maximum(
                    mask.sum(), 1.0)
            if use_cl:
                # masked-view contrastive regularizer (scheteronet.py:693-699)
                view_mask = (jax.random.uniform(jax.random.fold_in(key, 2), x.shape)
                             > mask_ratio).astype(x.dtype)
                z1, _ = self.net.apply({"params": params}, adj1, adj2,
                                       x * view_mask, training=True,
                                       rng=jax.random.fold_in(key, 3))
                loss = loss + cl_weight * contrastive_loss(logits, z1)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = self._tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @partial(jax.jit, static_argnames=("self", "use_zinb", "use_cl"))
    def _train_epochs(self, params, opt_state, adj1, adj2, x, x_raw, sf, y,
                      mask, zinb_weight, cl_weight, mask_ratio, keys,
                      use_zinb: bool, use_cl: bool):
        def epoch(carry, ek):
            params, opt_state = carry
            params, opt_state, loss = self._step(
                params, opt_state, adj1, adj2, x, x_raw, sf, y, mask,
                zinb_weight, cl_weight, mask_ratio, ek, use_zinb, use_cl)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(epoch, (params, opt_state),
                                                   keys)
        return params, opt_state, losses

    def fit(self, graph, y, x_raw=None, size_factors=None, use_zinb: bool = True,
            zinb_weight: float = 0.1, cl_weight: float = 0.0,
            mask_ratio: float = 0.2, epochs: int = 200, lr: float = 1e-2,
            train_idx=None, use_bsr="auto", bsr_block: int = 128):
        """``use_bsr=True`` RCM-bands the cell kNN graph once and runs every
        HetConv aggregation (one-hop AND strict two-hop — the squared graph
        stays banded when the one-hop is) through the Pallas block-sparse
        SpMM. Energy propagation stays on the (permuted) CSR path — it is a
        one-off inference pass. Outputs are un-permuted for callers."""
        from dance_tpu.graph import Graph
        assert isinstance(graph, Graph)
        x = np.asarray(graph.ndata["feat"], np.float32)
        y = as_numpy(y)
        if y.ndim == 2:
            y = y.argmax(1)
        n = x.shape[0]
        self.num_labels = int(y.max()) + 1
        if x_raw is None:
            x_raw, use_zinb = np.zeros_like(x), False
        else:
            x_raw = as_numpy(x_raw).astype(np.float32)
        if size_factors is None:
            counts = np.maximum(np.asarray(x_raw).sum(1), 1.0)
            size_factors = counts / np.median(counts)
        size_factors = np.asarray(size_factors, np.float32)
        mask = np.zeros(n, np.float32)
        mask[np.asarray(train_idx if train_idx is not None else np.arange(n))] = 1

        raw_adj = sp.csr_matrix(graph.adj)
        from dance_tpu.ops.pallas_kernels import resolve_use_bsr
        auto_fmt = use_bsr == "auto"
        use_bsr = resolve_use_bsr(use_bsr, raw_adj, bsr_block)
        # the hop-adjacency build (RCM + squared graph + device upload of the
        # full matrices) costs seconds per fit — cached across fits on the
        # same graph/data (content hash)
        import hashlib
        h = hashlib.md5(np.ascontiguousarray(x))
        h.update(np.ascontiguousarray(x_raw))
        h.update(np.ascontiguousarray(mask))
        h.update(np.ascontiguousarray(y))
        cache_key = (id(graph), raw_adj.shape, raw_adj.nnz, use_bsr, bsr_block,
                     h.hexdigest())
        if getattr(self, "_build_cache_key", None) == cache_key:
            (adj1, adj2, self._prop_adj, self._perm, xj, xrj, sfj, yj,
             mj) = self._build_cache
            x = np.asarray(xj)  # permuted view for the net-shape init below
        else:
            self._perm = None
            if use_bsr:
                from dance_tpu.ops.pallas_kernels import (bsr_from_scipy,
                                                          rcm_reorder)
                perm, raw_adj = rcm_reorder(raw_adj)
                self._perm = np.asarray(perm)
                x, x_raw = x[self._perm], x_raw[self._perm]
                y, mask = y[self._perm], mask[self._perm]
                size_factors = size_factors[self._perm]
                a1, a2 = build_hop_adjacencies(raw_adj)
                adj1 = bsr_from_scipy(a1, block=bsr_block)
                adj2 = bsr_from_scipy(a2, block=bsr_block)
            else:
                a1, a2 = build_hop_adjacencies(raw_adj)
                adj1, adj2 = csr_from_scipy(a1), csr_from_scipy(a2)
            if auto_fmt:
                # the STRICT two-hop of a kNN graph squares the density
                # (k=15 at 10k nodes → ~2%): per-hop upgrade to the dense
                # MXU regime when choose_adj_format says so — the two-hop
                # spmm dominates the HetConv epoch otherwise
                from dance_tpu.ops.pallas_kernels import choose_adj_format
                from dance_tpu.ops.sparse import dense_adj_from_scipy
                for name, a in (("adj1", a1), ("adj2", a2)):
                    if choose_adj_format(a, reorder=False) == "dense":
                        if name == "adj1":
                            adj1 = dense_adj_from_scipy(a)
                        else:
                            adj2 = dense_adj_from_scipy(a)
            # row-normalized one-hop adjacency for energy propagation (:611-640)
            self._prop_adj = csr_from_scipy(raw_adj)
            xj = jnp.asarray(x)
            xrj = jnp.asarray(x_raw, jnp.float32)
            sfj = jnp.asarray(size_factors, jnp.float32)
            yj = jnp.asarray(y, jnp.int32)
            mj = jnp.asarray(mask)
            self._build_cache_key = cache_key
            self._build_cache = (adj1, adj2, self._prop_adj, self._perm, xj,
                                 xrj, sfj, yj, mj)

        self.net = _HeteroNet(n_classes=self.num_labels, hidden=self.hidden_channels,
                              num_layers=self.num_layers, dropout=self.dropout,
                              use_bn=self.use_bn, n_genes=x.shape[1])
        key = jax.random.key(self.seed)
        # init must reach the ZINB decoder branch too, not just the classifier
        self.params = self.net.init(
            key, adj1, adj2, jnp.asarray(x),
            method=lambda m, a, b, xx: (m(a, b, xx),
                                        m.zinb(m.embed(a, b, xx))))["params"]
        self._tx = optax.adam(lr)
        opt_state = self._tx.init(self.params)
        # all epochs in ONE compiled scan: the per-epoch Python dispatch cost
        # ~370 ms/epoch over the axon relay vs 25 ms of on-chip step compute
        # (benchmarks/profile_slow.py scheteronet lane)
        keys = jax.random.split(jax.random.fold_in(key, 17), epochs)
        self.params, opt_state, losses = self._train_epochs(
            self.params, opt_state, adj1, adj2, xj, xrj, sfj, yj, mj,
            zinb_weight, cl_weight, mask_ratio, keys, use_zinb,
            cl_weight != 0.0)
        losses = np.asarray(losses)
        for epoch in range(0, epochs, 50):
            logger.info("scHeteroNet epoch %d, loss %.5f", epoch,
                        float(losses[epoch]))
        self._cache = (adj1, adj2, xj)
        return self

    # --- OOD machinery ------------------------------------------------------

    def propagation(self, e, adj: CSRMatrix, prop_layers: int = 1,
                    alpha: float = 0.5):
        """One-hop energy belief propagation over the row-normalized adjacency
        (parity: scheteronet.py:611)."""
        e = jnp.asarray(e)[:, None]
        for _ in range(prop_layers):
            e = e * alpha + spmm(adj, e, weighted=False, op="mean") * (1 - alpha)
        return np.asarray(e[:, 0])

    def two_hop_propagation(self, e, adj: CSRMatrix, prop_layers: int = 1,
                            alpha: float = 0.5):
        """Two-hop variant: propagate through the SQUARED row-normalized
        adjacency (parity: scheteronet.py:625-640)."""
        e = jnp.asarray(e)[:, None]
        for _ in range(prop_layers):
            hop = spmm(adj, spmm(adj, e, weighted=False, op="mean"),
                       weighted=False, op="mean")
            e = e * alpha + hop * (1 - alpha)
        return np.asarray(e[:, 0])

    def detect(self, graph=None, node_idx=None, T: float = 1.0,
               use_prop: bool = True, use_2hop: bool = False, oodprop: int = 2,
               oodalpha: float = 0.5, **kwargs):
        """Negative-energy OOD score per node (higher = in-distribution)."""
        adj1, adj2, x = self._cache
        logits, _ = self.net.apply({"params": self.params}, adj1, adj2, x)
        neg_energy = T * jax.scipy.special.logsumexp(logits / T, axis=-1)
        if use_prop:
            prop = (self.two_hop_propagation if use_2hop else self.propagation)
            neg_energy = prop(neg_energy, self._prop_adj, oodprop, oodalpha)
        from dance_tpu.ops.pallas_kernels import unpermute
        neg_energy = unpermute(getattr(self, "_perm", None), np.asarray(neg_energy))
        return neg_energy[node_idx] if node_idx is not None else neg_energy

    def evaluate_ood(self, ind_idx, ood_idx, **detect_kwargs):
        """(auroc, aupr, fpr@95) for OOD detection (parity: scheteronet.py:760)."""
        from dance_tpu.utils.metrics import ood_measures
        scores = self.detect(**detect_kwargs)
        return ood_measures(scores[np.asarray(ind_idx)], scores[np.asarray(ood_idx)])

    def predict_proba(self, graph=None):
        from dance_tpu.ops.pallas_kernels import unpermute
        adj1, adj2, x = self._cache
        logits, _ = self.net.apply({"params": self.params}, adj1, adj2, x)
        return unpermute(getattr(self, "_perm", None),
                         np.asarray(jax.nn.softmax(logits, axis=-1)))

    def predict(self, graph=None, idx=None):
        pred = self.predict_proba(graph).argmax(1)
        return pred[idx] if idx is not None else pred


# --------------------------------------------------------------------------
# reference-named evaluation helpers (parity: scheteronet.py:44,1034-1100)
# --------------------------------------------------------------------------

def eval_acc(true_labels, model_output, acc=None):
    """Accuracy of argmax predictions vs integer labels (scheteronet.py:44)."""
    pred = np.asarray(model_output).argmax(1)
    y = np.asarray(true_labels)
    if y.ndim == 2 and y.shape[1] == 1:
        y = y[:, 0]
    elif y.ndim == 2:
        y = y.argmax(1)
    return float((pred == y).mean())


def stable_cumsum(arr, rtol=1e-05, atol=1e-08):
    """float64 cumsum with a final-value consistency check (scheteronet.py:1034)."""
    out = np.cumsum(arr, dtype=np.float64)
    expected = np.sum(arr, dtype=np.float64)
    if not np.allclose(out[-1], expected, rtol=rtol, atol=atol):
        raise RuntimeError("cumsum was found to be unstable: its last element "
                           "does not correspond to sum")
    return out


def fpr_and_fdr_at_recall(y_true, y_score, recall_level=0.95, pos_label=None):
    """FPR at the score threshold reaching ``recall_level`` on positives
    (parity: scheteronet.py:1055)."""
    y_true = np.asarray(y_true)
    y_score = np.asarray(y_score)
    classes = np.unique(y_true)
    if (pos_label is None
            and not any(np.array_equal(classes, c)
                        for c in ([0, 1], [-1, 1], [0], [-1], [1]))):
        raise ValueError("Data is not binary and pos_label is not specified")
    if pos_label is None:
        pos_label = 1.0
    y_true = y_true == pos_label
    desc = np.argsort(y_score, kind="mergesort")[::-1]
    y_score, y_true = y_score[desc], y_true[desc]
    distinct = np.where(np.diff(y_score))[0]
    threshold_idxs = np.r_[distinct, y_true.size - 1]
    tps = stable_cumsum(y_true)[threshold_idxs]
    fps = 1 + threshold_idxs - tps
    recall = tps / tps[-1]
    last_ind = tps.searchsorted(tps[-1])
    sl = slice(last_ind, None, -1)
    recall, fps = np.r_[recall[sl], 1], np.r_[fps[sl], 0]
    cutoff = np.argmin(np.abs(recall - recall_level))
    return float(fps[cutoff] / (np.sum(~y_true) or 1))


def get_measures(in_scores, out_scores, recall_level=0.95):
    """(auroc, aupr, fpr@recall) for OOD scores (parity: scheteronet.py
    get_measures); delegates to the framework's ood_measures."""
    from dance_tpu.utils.metrics import ood_measures
    return ood_measures(in_scores, out_scores)


# --------------------------------------------------------------------------
# reference-named data plumbing + architecture names (parity:
# scheteronet.py:68-160, 339-575, 791-830)
# --------------------------------------------------------------------------

class HetConv(nn.Module):
    """One neighborhood-aggregation step: [A1 x ; A2 x] (scheteronet.py:374)."""

    @nn.compact
    def __call__(self, x, adj_t, adj_t2):
        return jnp.concatenate([spmm(adj_t, x), spmm(adj_t2, x)], axis=1)


# the framework's HeteroNet/ZINBDecoder under the reference class names
HeteroNet = _HeteroNet
ZINBDecoder = _ZINBDecoder


class NCDataset:
    """Plain graph/label container with named splits (parity:
    scheteronet.py:68; based off ogb's NodePropPredDataset, arrays instead
    of torch tensors)."""

    def __init__(self, name):
        self.name = name
        self.graph = {}
        self.label = None
        self.split_idx = {}

    def get_idx_split(self):
        return self.split_idx

    def __getitem__(self, idx):
        assert idx == 0, "This dataset has only one graph"
        return self.graph, self.label

    def __len__(self):
        return 1

    def __repr__(self):
        return f"{self.__class__.__name__}({len(self)})"


def get_genename(raw_adata):
    """Gene names from var['gene_id'/'symbol'] or the index
    (parity: scheteronet.py:791)."""
    if "gene_id" in raw_adata.var.keys():
        return raw_adata.var["gene_id"].values
    if "symbol" in raw_adata.var.keys():
        return raw_adata.var["symbol"].values
    return raw_adata.var.index


def set_split(data, train_idx=(), val_idx=(), test_idx=()):
    """Record train/val/test + in-distribution/OOD splits in ``uns``; the
    rarest cell type becomes the OOD class and is dropped from the labeled
    splits (parity: scheteronet.py:801)."""
    from collections import Counter

    import pandas as pd
    adata = data.data
    y = np.argmax(np.asarray(adata.obsm["cell_type"]), axis=1)
    for obsm in list(adata.obsm.keys()):
        if obsm == "cell_type":
            adata.obs[obsm + "_raw"] = y
        if isinstance(adata.obsm[obsm], pd.DataFrame):
            adata.obsm[obsm] = adata.obsm[obsm].values
    adata.obs["cell"] = y
    adata.var["gene_name"] = get_genename(adata)
    ood_class = min(Counter(y).items(), key=lambda kv: kv[1])[0]
    ood_idx = [i for i, v in enumerate(y) if v == ood_class]
    id_idx = [i for i, v in enumerate(y) if v != ood_class]
    adata.uns["train_idx"] = [i for i in train_idx if i not in ood_idx]
    adata.uns["val_idx"] = [i for i in val_idx if i not in ood_idx]
    adata.uns["test_idx"] = [i for i in test_idx if i not in ood_idx]
    adata.uns["ood_idx"] = ood_idx
    adata.uns["id_idx"] = id_idx
    return data


def set_graph_split(adata, ref_adata_name, g):
    """Boolean split masks onto a Graph's ndata from ``uns`` index lists
    (parity: scheteronet.py:110; masks instead of DGL node data)."""
    num_nodes = g.adj.shape[0]
    for name in ("train", "val", "test", "id", "ood"):
        mask = np.zeros(num_nodes, bool)
        mask[np.asarray(adata.uns[f"{name}_idx"], int)] = True
        g.ndata[f"{name}_mask"] = mask
    return g


def print_statistics(adata, name: str = "dataset"):
    """Log basic dataset statistics (parity: scheteronet.py print_statistics)."""
    logger.info("%s: %d cells x %d genes", name, adata.shape[0], adata.shape[1])
    if "cell" in getattr(adata.obs, "columns", []):
        import collections
        counts = collections.Counter(np.asarray(adata.obs["cell"]))
        logger.info("%s class counts: %s", name, dict(sorted(counts.items())))


# reference name for the plain MLP baseline head (scheteronet.py:339)
from dance_tpu.nn.mlp import VanillaMLP as MLP  # noqa: E402,F401

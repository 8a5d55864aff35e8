"""Legacy graph-construction utilities (parity: dance/transforms/graph_construct.py).

Carries the scMoGNN-era helpers: pathway aggregation (:169), the basic
cell-feature graph (:305), batch features (:370), and iterative feature
propagation (:582-640) — all reformulated over the framework graph structs
with the propagation loop jitted.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from dance_tpu.graph import Graph
from dance_tpu.ops.sparse import CSRMatrix, csr_from_scipy, csr_matmat
from dance_tpu.settings import logger
from dance_tpu.typing import Dict, List, Optional


def construct_pathway_graph(var_names: List[str], pathways: Dict[str, List[str]]
                            ) -> sp.csr_matrix:
    """Gene × pathway membership matrix (parity: graph_construct.py:169)."""
    name_to_idx = {n: i for i, n in enumerate(var_names)}
    rows, cols = [], []
    for j, genes in enumerate(pathways.values()):
        for g in genes:
            if g in name_to_idx:
                rows.append(name_to_idx[g])
                cols.append(j)
    data = np.ones(len(rows), np.float32)
    return sp.csr_matrix((data, (rows, cols)),
                         shape=(len(var_names), len(pathways)))


def basic_feature_graph(x, *, normalize_row: bool = True) -> Graph:
    """Cell-feature bipartite graph straight from the expression matrix
    (parity: graph_construct.py:305)."""
    x = sp.csr_matrix(x)
    if normalize_row:
        sums = np.asarray(x.sum(1)).ravel()
        x = sp.diags(1.0 / np.maximum(sums, 1e-12)) @ x
    n_cells, n_feats = x.shape
    coo = x.tocoo()
    src = np.concatenate([coo.row + n_feats, coo.col])
    dst = np.concatenate([coo.col, coo.row + n_feats])
    w = np.concatenate([coo.data, coo.data]).astype(np.float32)
    adj = sp.csr_matrix((w, (dst, src)), shape=(n_cells + n_feats,) * 2)
    return Graph(adj, info={"num_cells": n_cells, "num_genes": n_feats})


def batch_features(x, batches) -> np.ndarray:
    """Per-batch mean statistical features for each cell
    (parity: graph_construct.py:370; see also transforms.cell_feature.BatchFeature)."""
    x = np.asarray(x.todense() if sp.issparse(x) else x, np.float64)
    batches = np.asarray(batches)
    nz = np.where(x != 0, x, np.nan)
    stats = np.column_stack([
        x.mean(1), x.std(1), np.nanpercentile(nz, 25, axis=1),
        np.nanpercentile(nz, 50, axis=1), np.nanpercentile(nz, 75, axis=1),
        x.max(1), (x != 0).sum(1) / 1000, np.nanmean(nz, 1), np.nanstd(nz, 1)])
    stats = np.nan_to_num(stats)
    out = np.zeros_like(stats)
    for b in np.unique(batches):
        m = batches == b
        out[m] = stats[m].mean(0)
    return out.astype(np.float32)


@partial(jax.jit, static_argnames=("n_steps",))
def _propagate(adj: CSRMatrix, feat, n_steps: int, alpha: float):
    def body(_, h):
        return alpha * feat + (1 - alpha) * csr_matmat(adj, h)

    return jax.lax.fori_loop(0, n_steps, body, feat)


def feature_propagation(adj, feat, *, n_steps: int = 3, alpha: float = 0.5,
                        normalize: bool = True) -> np.ndarray:
    """Iterative residual feature smoothing over a graph
    (parity: graph_construct.py:582-640), jitted as a fori_loop of SpMMs."""
    adj = sp.csr_matrix(adj)
    if normalize:
        deg = np.asarray(adj.sum(1)).ravel()
        adj = sp.diags(1.0 / np.maximum(deg, 1e-12)) @ adj
    out = _propagate(csr_from_scipy(adj), jnp.asarray(np.asarray(feat), jnp.float32),
                     n_steps, alpha)
    return np.asarray(out)


__all__ = ["basic_feature_graph", "batch_features", "construct_basic_feature_graph",
           "construct_pathway_graph", "feature_propagation", "gen_batch_features"]


def construct_basic_feature_graph(feature_mod1, feature_mod1_test=None,
                                  bf_input=None, device: str = "auto") -> Graph:
    """Reference-named entry point (parity: graph_construct.py:305): a
    cell-feature bipartite graph over train(+test) cells with raw nonzero
    expression weights; optional per-cell batch features attach as ndata."""
    x = sp.csr_matrix(feature_mod1)
    if feature_mod1_test is not None:
        xt = sp.csr_matrix(feature_mod1_test)
        if xt.shape[1] != x.shape[1]:
            raise ValueError("train/test feature dims differ")
        x = sp.vstack([x, xt], format="csr")
    g = basic_feature_graph(x, normalize_row=False)
    n_cells, n_feats = x.shape
    # node layout: features [0, n_feats) then cells; bf covers every node
    if bf_input is not None:
        bf = gen_batch_features(bf_input)
        g.ndata["bf"] = np.concatenate(
            [np.zeros((n_feats, bf.shape[1]), np.float32), bf], axis=0)
    else:
        g.ndata["bf"] = np.zeros(n_feats + n_cells, np.float32)
    return g


def gen_batch_features(ad_inputs) -> np.ndarray:
    """Per-cell batch statistical features over a list of AnnData sub-datasets
    (parity: graph_construct.py:370); rows align with the concatenated cells."""
    if len(ad_inputs) >= 10:
        raise ValueError("gen_batch_features expects a short list of AnnData "
                         "objects (one per sub-dataset)")
    feats = []
    for ad in ad_inputs:
        feats.append(batch_features(ad.X, np.asarray(ad.obs["batch"])))
    return np.concatenate(feats, axis=0)


def csr_cosine_similarity(input_csr_matrix) -> np.ndarray:
    """Dense cosine-similarity matrix of sparse rows (graph_construct.py:24)."""
    similarity = input_csr_matrix * input_csr_matrix.T
    square_mag = similarity.diagonal()
    with np.errstate(divide="ignore"):
        inv_square_mag = 1.0 / square_mag
    inv_square_mag[np.isinf(inv_square_mag)] = 0
    inv_mag = np.sqrt(inv_square_mag)
    return np.asarray(similarity.multiply(inv_mag).T.multiply(inv_mag).todense())


def cosine_similarity_gene(input_matrix) -> np.ndarray:
    """Absolute cosine similarity between rows (graph_construct.py:34)."""
    from sklearn.metrics.pairwise import cosine_similarity
    return np.abs(cosine_similarity(input_matrix))


def extract_color(x_pixel=None, y_pixel=None, image=None, beta=49) -> np.ndarray:
    """Variance-weighted grayscale per spot from an H&E image patch
    (parity: graph_construct.py:40; used by SpaGCN's histology graph)."""
    beta_half = round(beta / 2)
    max_x, max_y = image.shape[0], image.shape[1]
    g = []
    for xi, yi in zip(x_pixel, y_pixel):
        nbs = image[max(0, xi - beta_half):min(max_x, xi + beta_half + 1),
                    max(0, yi - beta_half):min(max_y, yi + beta_half + 1)]
        g.append(nbs.mean(axis=(0, 1)))
    g = np.asarray(g)
    c0, c1, c2 = g[:, 0], g[:, 1], g[:, 2]
    vs = np.array([np.var(c0), np.var(c1), np.var(c2)])
    return (c0 * vs[0] + c1 * vs[1] + c2 * vs[2]) / vs.sum()


def basic_feature_graph_propagation(g, layers=3, alpha=0.5, beta=0.5,
                                    cell_init=None, feature_init="id",
                                    device=None, verbose=True):
    """Per-layer propagated cell embeddings over a cell-feature graph
    (parity: graph_construct.py:598; same recurrence as
    joint_embedding.scmogcn.cell_feature_propagation)."""
    from dance_tpu.modules.multi_modality.joint_embedding.scmogcn import (
        cell_feature_propagation)
    assert layers > 2, ("Less than two feature graph propagation layers is "
                        "equivalent to original features.")
    return cell_feature_propagation(g, alpha=alpha, beta=beta,
                                    cell_init=cell_init,
                                    feature_init=feature_init, layers=layers)


def basic_feature_propagation(dataset, layers, transformed=True, device=None):
    """Propagate both modalities' cell-feature graphs
    (parity: graph_construct.py:582). Duck-typed on the legacy
    ``dataset.sparse_features()`` / ``dataset.preprocessed_features``
    protocol the reference function expects (its own current datasets no
    longer provide it)."""
    if transformed:
        feats = dataset.preprocessed_features
        g1 = construct_basic_feature_graph(feats["mod1_train"],
                                           feats["mod1_test"], device=device)
        g2 = construct_basic_feature_graph(feats["mod2_train"],
                                           feats["mod2_test"], device=device)
    else:
        sf = dataset.sparse_features()
        g1 = construct_basic_feature_graph(sf[0], sf[2], device=device)
        g2 = construct_basic_feature_graph(sf[1], sf[3], device=device)
    return (basic_feature_graph_propagation(g1, layers, verbose=False),
            basic_feature_graph_propagation(g2, layers, verbose=False))


def scGNNgenerateAdj(featureMatrix, graphType="KNNgraph", para=None,
                     parallelLimit=0, adjTag=True):
    """scGNN edge-list/adjacency generation (parity: graph_construct.py:659).

    Supports the reference's main modes: ``KNNgraph`` (``para='<dist>:<k>'``,
    kNN on a scipy cdist matrix) and ``KNNgraphPairwise``. Returns
    ``(adj, edgeList)`` with ``adj=None`` when ``adjTag`` is False."""
    from scipy.spatial.distance import cdist

    featureMatrix = np.asarray(featureMatrix)
    distance_type, k = "euclidean", 10
    if para is not None:
        words = str(para).split(":")
        if graphType == "KNNgraphPairwise":
            k = int(words[1])
        else:
            distance_type = words[0]
            if len(words) > 1:
                k = int(words[1])
    dist = cdist(featureMatrix, featureMatrix, metric=distance_type
                 if graphType != "KNNgraphPairwise" else "minkowski")
    edge_list = []
    for i in range(dist.shape[0]):
        for j in dist[i].argsort()[:k]:
            edge_list.append((i, int(j)))
    adj = None
    if adjTag:
        rows, cols = zip(*edge_list)
        n = featureMatrix.shape[0]
        adj = sp.csr_matrix((np.ones(len(edge_list)), (rows, cols)),
                            shape=(n, n))
        adj = ((adj + adj.T) > 0).astype(np.float32)
    return adj, edge_list


def generate_cell_features(data, *, group_batch: bool = False,
                           batch_col_id: str = "batch"):
    """Per-cell statistical node features from AnnData objects
    (parity: graph_construct.py:433): cell mean/std, nonzero quartiles/max/
    count/mean/std, optionally averaged within batches."""
    data = data if isinstance(data, list) else [data]
    feats = []
    for adata in data:
        x = adata.X
        batches = (np.asarray(adata.obs[batch_col_id])
                   if batch_col_id in getattr(adata.obs, "columns", [])
                   else np.zeros(adata.shape[0], int))
        if group_batch:
            feats.append(batch_features(x, batches))
        else:
            stats = batch_features(x, np.arange(adata.shape[0]))
            feats.append(stats)
    return np.concatenate(feats, axis=0)

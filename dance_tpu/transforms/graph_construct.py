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

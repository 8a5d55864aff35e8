"""Tools: clustering/embedding over the neighbor graph (scanpy.tl subset)."""

from typing import Optional

import numpy as np
import pandas as pd
import scipy.sparse as sp

from dance_tpu.settings import logger


def _get_conn(adata):
    if "connectivities" not in adata.obsp:
        from dance_tpu.sc.pp import neighbors
        neighbors(adata)
    return adata.obsp["connectivities"]


def louvain(adata, *, resolution: float = 1.0, key_added: str = "louvain",
            random_state: int = 0):
    from dance_tpu.ops.cluster import louvain as _louvain
    labels = _louvain(_get_conn(adata), resolution=resolution, seed=random_state)
    adata.obs[key_added] = pd.Categorical(labels.astype(str))
    return None


def leiden(adata, *, resolution: float = 1.0, key_added: str = "leiden",
           random_state: int = 0):
    from dance_tpu.ops.cluster import leiden as _leiden
    labels = _leiden(_get_conn(adata), resolution=resolution, seed=random_state)
    adata.obs[key_added] = pd.Categorical(labels.astype(str))
    return None


def pca(adata, *, n_comps: int = 50, random_state: int = 0, **kwargs):
    from dance_tpu.sc.pp import pca as _pca
    return _pca(adata, n_comps=n_comps, random_state=random_state)


def umap(adata, *, n_components: int = 2, random_state: int = 0, **kwargs):
    """2-d embedding of the neighbor graph.

    Deviation from scanpy: uses spectral embedding of the connectivity
    Laplacian (UMAP's own initialization) rather than the full UMAP
    optimization — no umap-learn dependency, deterministic, and adequate for
    the visualization role it plays in the reference."""
    conn = sp.csr_matrix(_get_conn(adata)).astype(np.float64)
    deg = np.asarray(conn.sum(1)).ravel()
    dinv = 1.0 / np.sqrt(np.maximum(deg, 1e-12))
    L = sp.eye(conn.shape[0]) - sp.diags(dinv) @ conn @ sp.diags(dinv)
    from scipy.sparse.linalg import eigsh
    k = n_components + 1
    vals, vecs = eigsh(L, k=k, sigma=0, which="LM")
    emb = vecs[:, 1:k]
    adata.obsm["X_umap"] = (emb / np.maximum(np.abs(emb).max(0), 1e-12) * 10).astype(
        np.float32)
    return None


def rank_genes_groups(adata, groupby: str, *, method: str = "t-test", n_genes: int = 100,
                      key_added: str = "rank_genes_groups"):
    """Marker genes per group via Welch t-test (scanpy t-test parity)."""
    from dance_tpu.sc.pp import _dense
    X = _dense(adata.X).astype(np.float64)
    groups = np.asarray(adata.obs[groupby])
    names, scores = {}, {}
    for g in np.unique(groups):
        m = groups == g
        x1, x0 = X[m], X[~m]
        n1, n0 = len(x1), len(x0)
        mu1, mu0 = x1.mean(0), x0.mean(0)
        v1 = x1.var(0, ddof=1) if n1 > 1 else np.zeros(X.shape[1])
        v0 = x0.var(0, ddof=1) if n0 > 1 else np.zeros(X.shape[1])
        denom = np.sqrt(v1 / max(n1, 1) + v0 / max(n0, 1))
        t = np.divide(mu1 - mu0, denom, out=np.zeros_like(mu1), where=denom > 0)
        order = np.argsort(-t)[:n_genes]
        names[str(g)] = adata.var_names.to_numpy()[order]
        scores[str(g)] = t[order]
    adata.uns[key_added] = {"names": names, "scores": scores,
                            "params": {"groupby": groupby, "method": method}}
    return None


def score_genes(adata, gene_list, *, score_name: str = "score", ctrl_size: int = 50,
                random_state: int = 0):
    """Mean expression of gene set minus a random control set (scanpy parity)."""
    from dance_tpu.sc.pp import _dense
    rng = np.random.default_rng(random_state)
    genes = [g for g in gene_list if g in set(adata.var_names)]
    if not genes:
        logger.warning("score_genes: no genes from the list found in var_names")
        adata.obs[score_name] = 0.0
        return None
    X = _dense(adata.X)
    idx = adata.var_names.get_indexer(genes)
    ctrl = rng.choice(adata.n_vars, size=min(ctrl_size, adata.n_vars), replace=False)
    adata.obs[score_name] = X[:, idx].mean(1) - X[:, ctrl].mean(1)
    return None

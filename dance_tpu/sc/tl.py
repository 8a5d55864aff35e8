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


def _spectral_init(conn, n_components: int) -> np.ndarray:
    deg = np.asarray(conn.sum(1)).ravel()
    dinv = 1.0 / np.sqrt(np.maximum(deg, 1e-12))
    L = sp.eye(conn.shape[0]) - sp.diags(dinv) @ conn @ sp.diags(dinv)
    from scipy.sparse.linalg import eigsh
    k = n_components + 1
    # fixed start vector: ARPACK's random v0 would make the embedding (and
    # anything downstream) nondeterministic across calls
    v0 = np.full(conn.shape[0], 1.0 / np.sqrt(conn.shape[0]))
    vals, vecs = eigsh(L, k=k, sigma=0, which="LM", v0=v0)
    emb = vecs[:, 1:k]
    return (emb / np.maximum(np.abs(emb).max(0), 1e-12) * 10).astype(np.float32)


def umap(adata, *, n_components: int = 2, random_state: int = 0,
         n_epochs: int = 200, min_dist: float = 0.5, spread: float = 1.0,
         learning_rate: float = 1.0, init: str = "spectral", **kwargs):
    """UMAP layout of the neighbor graph (parity: scanpy sc.tl.umap).

    First-party, TPU-native: spectral initialization (UMAP's own default),
    then the UMAP cross-entropy layout as a jitted ``lax.scan`` over epochs —
    per-epoch vectorized attraction over ALL graph edges plus one negative
    sample per edge, instead of umap-learn's sequential per-edge SGD. The
    (a, b) curve params are fit from (min_dist, spread) as in umap-learn.
    """
    import jax
    import jax.numpy as jnp
    conn = sp.csr_matrix(_get_conn(adata)).astype(np.float64)
    emb0 = _spectral_init(conn, n_components)
    if init == "spectral" and n_epochs == 0:
        adata.obsm["X_umap"] = emb0
        return None

    # fit (a, b) so 1/(1+a d^{2b}) matches exp(-(d-min_dist)/spread) past min_dist
    from scipy.optimize import curve_fit
    xv = np.linspace(0, spread * 3, 300)
    yv = np.where(xv < min_dist, 1.0, np.exp(-(xv - min_dist) / spread))
    (a, b), _ = curve_fit(lambda x, a, b: 1.0 / (1.0 + a * x ** (2 * b)), xv, yv,
                          maxfev=10000)

    coo = sp.coo_matrix(sp.triu(conn.maximum(conn.T), k=1))
    src = jnp.asarray(coo.row, jnp.int32)
    dst = jnp.asarray(coo.col, jnp.int32)
    w = jnp.asarray(coo.data / coo.data.max(), jnp.float32)
    n = conn.shape[0]

    def epoch(carry, inp):
        emb, key = carry
        alpha = inp
        key, nk = jax.random.split(key)
        d_pos = emb[src] - emb[dst]
        dist2 = (d_pos ** 2).sum(1)
        # attractive gradient of the UMAP CE w.r.t. positive pairs
        grad_coef = (-2.0 * a * b * dist2 ** (b - 1.0)
                     / (1.0 + a * dist2 ** b))[:, None] * w[:, None]
        g_pos = jnp.clip(grad_coef * d_pos, -4.0, 4.0)
        # one negative sample per edge
        neg = jax.random.randint(nk, src.shape, 0, n)
        d_neg = emb[src] - emb[neg]
        nd2 = (d_neg ** 2).sum(1)
        rep_coef = (2.0 * b / ((0.001 + nd2) * (1.0 + a * nd2 ** b)))[:, None]
        g_neg = jnp.clip(rep_coef * d_neg, -4.0, 4.0) * w[:, None]
        upd = (jnp.zeros_like(emb)
               .at[src].add(alpha * (g_pos + g_neg))
               .at[dst].add(-alpha * g_pos))
        return (emb + upd, key), None

    alphas = jnp.asarray(learning_rate * (1.0 - np.arange(n_epochs) / n_epochs),
                         jnp.float32)
    key = jax.random.key(random_state)
    (emb, _), _ = jax.lax.scan(epoch, (jnp.asarray(emb0), key), alphas)
    adata.obsm["X_umap"] = np.asarray(emb, dtype=np.float32)
    return None


def _bh_adjust(p: np.ndarray) -> np.ndarray:
    """Benjamini-Hochberg adjusted p-values."""
    n = len(p)
    order = np.argsort(p)
    ranked = p[order] * n / (np.arange(n) + 1)
    ranked = np.minimum.accumulate(ranked[::-1])[::-1]
    out = np.empty(n)
    out[order] = np.minimum(ranked, 1.0)
    return out


def rank_genes_groups(adata, groupby: str, *, method: str = "t-test", n_genes: int = 100,
                      key_added: str = "rank_genes_groups", pts: bool = False,
                      corr_method: str = "benjamini-hochberg"):
    """Marker genes per group.

    ``method='t-test'``: Welch t-test (scanpy parity).  ``method='wilcoxon'``:
    rank-sum z-scores with tie correction, normal-approximation p-values, BH
    adjustment, log-fold-changes and (with ``pts=True``) nonzero fractions —
    the statistics scanpy's wilcoxon path exposes and stdGCN's marker
    selection filters on (reference stdgcn.py:1243-1264).
    """
    from dance_tpu.sc.pp import _dense
    X = _dense(adata.X).astype(np.float64)
    groups = np.asarray(adata.obs[groupby])
    n, G = X.shape
    names, scores = {}, {}
    pvals, pvals_adj, lfc, pct_g, pct_r = {}, {}, {}, {}, {}
    if method == "wilcoxon":
        from scipy.stats import norm, rankdata
        ranks = rankdata(X, axis=0)                     # per-gene ranks, ties avg
        # tie correction term per gene: Σ(t³ - t)
        tie_term = np.zeros(G)
        for j in range(G):
            _, counts = np.unique(X[:, j], return_counts=True)
            tie_term[j] = np.sum(counts.astype(np.float64) ** 3 - counts)
    expm1 = np.expm1
    for g in np.unique(groups):
        m = groups == g
        x1, x0 = X[m], X[~m]
        n1, n0 = len(x1), len(x0)
        if method == "wilcoxon":
            r1 = ranks[m].sum(0)
            mu = n1 * (n + 1) / 2.0
            sigma2 = (n1 * n0 / 12.0) * ((n + 1) - tie_term / (n * (n - 1)))
            z = (r1 - mu) / np.sqrt(np.maximum(sigma2, 1e-12))
            stat = z
            p = 2 * norm.sf(np.abs(z))
        else:
            mu1, mu0 = x1.mean(0), x0.mean(0)
            v1 = x1.var(0, ddof=1) if n1 > 1 else np.zeros(G)
            v0 = x0.var(0, ddof=1) if n0 > 1 else np.zeros(G)
            denom = np.sqrt(v1 / max(n1, 1) + v0 / max(n0, 1))
            stat = np.divide(mu1 - mu0, denom, out=np.zeros(G), where=denom > 0)
            from scipy.stats import norm
            p = 2 * norm.sf(np.abs(stat))
        key = str(g)
        order = np.argsort(-stat)[:max(n_genes, G) if method == "wilcoxon" else n_genes]
        names[key] = adata.var_names.to_numpy()[order]
        scores[key] = stat[order]
        padj = _bh_adjust(p) if corr_method == "benjamini-hochberg" else p
        pvals[key], pvals_adj[key] = p[order], padj[order]
        # scanpy logfoldchanges: log2((expm1(mean1)+1e-9) / (expm1(mean0)+1e-9))
        lfc[key] = np.log2((expm1(x1.mean(0)[order]) + 1e-9)
                           / (expm1(x0.mean(0)[order]) + 1e-9))
        if pts:
            pct_g[key] = (x1[:, order] > 0).mean(0)
            pct_r[key] = (x0[:, order] > 0).mean(0)
    res = {"names": names, "scores": scores, "pvals": pvals,
           "pvals_adj": pvals_adj, "logfoldchanges": lfc,
           "params": {"groupby": groupby, "method": method}}
    if pts:
        res["pts"], res["pts_rest"] = pct_g, pct_r
    adata.uns[key_added] = res
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


def score_genes_cell_cycle(adata, s_genes, g2m_genes, *, ctrl_size: int = 50,
                           random_state: int = 0):
    """Cell-cycle scoring (scanpy sc.tl.score_genes_cell_cycle parity):
    score S and G2M gene sets, then assign each cell the phase of its higher
    score, or G1 when both scores are negative. Writes obs S_score /
    G2M_score / phase."""
    score_genes(adata, s_genes, score_name="S_score", ctrl_size=ctrl_size,
                random_state=random_state)
    score_genes(adata, g2m_genes, score_name="G2M_score", ctrl_size=ctrl_size,
                random_state=random_state)
    s = np.asarray(adata.obs["S_score"], dtype=np.float64)
    g2m = np.asarray(adata.obs["G2M_score"], dtype=np.float64)
    phase = np.where(g2m > s, "G2M", "S")
    phase = np.where((s < 0) & (g2m < 0), "G1", phase)
    adata.obs["phase"] = phase
    return None

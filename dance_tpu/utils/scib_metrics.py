"""First-party scIB joint-embedding metric suite.

Parity target: dance/utils/metrics.py:151-190 (integration_openproblems_
evaluate), which delegates to the scIB package — unavailable here, so each
metric is reimplemented from its published formula:

- ``silhouette_label``: scaled average silhouette width on cell types,
  (ASW+1)/2 (scib.me.silhouette).
- ``silhouette_batch``: per cell-type group, mean over cells of 1-|sil(batch)|,
  averaged over groups with >1 batch (scib.me.silhouette_batch).
- ``nmi_opt_louvain``: Louvain/Leiden over the embedding kNN graph with a
  resolution sweep 0.1..2.0, keeping the best NMI against cell types
  (scib.cl.opt_louvain + scib.me.nmi).
- ``graph_connectivity``: for each cell type, the fraction of its cells in
  the largest connected component of the type-restricted kNN subgraph,
  averaged (scib.me.graph_connectivity).
- ``cell_cycle_conservation``: 1 - |pcr_after - pcr_before| / pcr_before per
  batch, averaged, where pcr is the principal-component-regression variance
  explained by the S/G2M scores (scib.me.cell_cycle).
- ``trajectory_conservation``: Spearman correlation between the provided
  pseudotime and a diffusion pseudotime computed on the embedding kNN graph
  (scib.me.trajectory_conservation), reported as (corr+1)/2.

All heavy math (pairwise distances, eigenvector power iteration) runs jitted.
"""

import numpy as np

from dance_tpu.typing import Dict, Optional


def silhouette_label(emb, labels) -> float:
    from sklearn.metrics import silhouette_score
    return float((silhouette_score(emb, labels) + 1) / 2)


def silhouette_batch(emb, batch, group) -> float:
    from sklearn.metrics import silhouette_samples
    emb, batch, group = (np.asarray(a) for a in (emb, batch, group))
    per_group = []
    for g in np.unique(group):
        sel = group == g
        if len(np.unique(batch[sel])) < 2 or sel.sum() < 3:
            continue
        sil = silhouette_samples(emb[sel], batch[sel])
        per_group.append(float(np.mean(1 - np.abs(sil))))
    return float(np.mean(per_group)) if per_group else float("nan")


def _knn_adj(emb, k: int = 15):
    from dance_tpu.ops.neighbors import knn_graph
    emb = np.asarray(emb, np.float32)
    k = min(k, emb.shape[0] - 1)
    return knn_graph(emb, k, mode="connectivity", include_self=False)


def nmi_opt_louvain(emb, labels, k: int = 15,
                    resolutions: Optional[np.ndarray] = None) -> float:
    from sklearn.metrics import normalized_mutual_info_score

    from dance_tpu.ops.cluster import louvain
    adj = _knn_adj(emb, k)
    labels = np.asarray(labels)
    best = 0.0
    for res in (resolutions if resolutions is not None
                else np.arange(0.1, 2.01, 0.2)):
        pred = louvain(adj, resolution=float(res), seed=0)
        best = max(best, float(normalized_mutual_info_score(
            labels, pred, average_method="arithmetic")))
    return best


def graph_connectivity(emb, labels, k: int = 15) -> float:
    import scipy.sparse.csgraph as csgraph
    adj = _knn_adj(emb, k)
    labels = np.asarray(labels)
    fracs = []
    for lab in np.unique(labels):
        idx = np.where(labels == lab)[0]
        if len(idx) < 2:
            fracs.append(1.0)
            continue
        sub = adj[idx][:, idx]
        n_comp, comp = csgraph.connected_components(sub, directed=False)
        fracs.append(float(np.bincount(comp).max() / len(idx)))
    return float(np.mean(fracs))


def _pcr(emb, covariate, n_comps: int = 50) -> float:
    """Principal-component-regression variance explained by ``covariate``."""
    from dance_tpu.ops.linalg import pca
    emb = np.asarray(emb, np.float32)
    cov = np.asarray(covariate, np.float32)
    if cov.ndim == 1:
        cov = cov[:, None]
    k = min(n_comps, min(emb.shape) - 1)
    res = pca(emb, k)
    pcs = np.asarray(res.embedding)
    var = np.asarray(res.explained_variance)
    x = np.concatenate([cov, np.ones((len(cov), 1), np.float32)], axis=1)
    r2 = []
    for j in range(pcs.shape[1]):
        beta, *_ = np.linalg.lstsq(x, pcs[:, j], rcond=None)
        resid = pcs[:, j] - x @ beta
        tot = np.var(pcs[:, j])
        r2.append(0.0 if tot <= 1e-12 else 1 - np.var(resid) / tot)
    w = var / max(var.sum(), 1e-12)
    return float(np.sum(w * np.asarray(r2)))


def cell_cycle_conservation(emb_pre, emb_post, s_score, g2m_score,
                            batch=None) -> float:
    cc = np.stack([np.asarray(s_score, np.float32),
                   np.asarray(g2m_score, np.float32)], axis=1)
    batch = (np.zeros(len(cc)) if batch is None else np.asarray(batch))
    scores = []
    for b in np.unique(batch):
        sel = batch == b
        if sel.sum() < 5:
            continue
        before = _pcr(np.asarray(emb_pre)[sel], cc[sel])
        after = _pcr(np.asarray(emb_post)[sel], cc[sel])
        if before <= 1e-12:
            continue
        scores.append(max(1 - abs(after - before) / before, 0.0))
    return float(np.mean(scores)) if scores else float("nan")


def diffusion_pseudotime(emb, root: Optional[int] = None, k: int = 15,
                         n_iter: int = 200) -> np.ndarray:
    """Pseudotime from the embedding kNN graph: rank along the second
    eigenvector of the symmetric transition matrix (diffusion component 1),
    oriented so the root cell sits at time 0."""
    import jax
    import jax.numpy as jnp
    adj = _knn_adj(emb, k)
    a = np.asarray((adj + adj.T).todense(), np.float32)
    d = np.maximum(a.sum(1), 1e-12)
    t = a / np.sqrt(d)[:, None] / np.sqrt(d)[None, :]

    @jax.jit
    def second_eig(t):
        n = t.shape[0]
        v1 = jnp.sqrt(jnp.asarray(d)) / jnp.linalg.norm(jnp.sqrt(jnp.asarray(d)))
        v = jnp.ones(n) / jnp.sqrt(n) + 0.01 * jnp.arange(n)

        def body(v, _):
            v = t @ v
            v = v - (v @ v1) * v1  # deflate the trivial component
            return v / jnp.maximum(jnp.linalg.norm(v), 1e-12), None

        v, _ = jax.lax.scan(body, v / jnp.linalg.norm(v), None, length=n_iter)
        return v

    dc1 = np.asarray(second_eig(jnp.asarray(t)))
    if root is None:
        root = int(np.argmin(dc1))
    pt = np.abs(dc1 - dc1[root])
    return pt / max(pt.max(), 1e-12)


def trajectory_conservation(emb, pseudotime, labels=None) -> float:
    from scipy.stats import spearmanr
    pt_ref = np.asarray(pseudotime, np.float64)
    valid = np.isfinite(pt_ref)
    if valid.sum() < 10:
        return float("nan")
    emb_v = np.asarray(emb)[valid]
    pt_v = pt_ref[valid]
    dpt = diffusion_pseudotime(emb_v, root=int(np.argmin(pt_v)))
    corr = abs(spearmanr(dpt, pt_v).statistic)
    return float((corr + 1) / 2)


def integration_openproblems_suite(emb, cell_type, batch=None, *, emb_pre=None,
                                   s_score=None, g2m_score=None,
                                   pseudotime=None, k: int = 15
                                   ) -> Dict[str, float]:
    """Full scIB joint-embedding suite, averaged like the reference
    (``final_scores`` = mean of the computed metrics; metrics whose inputs are
    absent are skipped, mirroring the reference's NaN handling)."""
    emb = np.asarray(emb)
    cell_type = np.asarray(cell_type).ravel()
    score: Dict[str, float] = {}
    score["asw_label"] = silhouette_label(emb, cell_type)
    if batch is not None and len(np.unique(batch)) > 1:
        score["asw_batch"] = silhouette_batch(emb, batch, cell_type)
    score["nmi"] = nmi_opt_louvain(emb, cell_type, k=k)
    score["graph_conn"] = graph_connectivity(emb, cell_type, k=k)
    if s_score is not None and g2m_score is not None and emb_pre is not None:
        score["cc_cons"] = cell_cycle_conservation(emb_pre, emb, s_score,
                                                   g2m_score, batch)
    if pseudotime is not None:
        score["ti_cons"] = trajectory_conservation(emb, pseudotime, cell_type)
    finite = [v for v in score.values() if np.isfinite(v)]
    score["final_scores"] = float(np.mean(finite)) if finite else float("nan")
    return score


__all__ = [
    "cell_cycle_conservation", "diffusion_pseudotime", "graph_connectivity",
    "integration_openproblems_suite", "nmi_opt_louvain", "silhouette_batch",
    "silhouette_label", "trajectory_conservation",
]

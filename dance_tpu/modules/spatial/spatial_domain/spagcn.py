"""SpaGCN: histology-aware graph convolution + DEC for spatial domains.

Parity target: dance/modules/spatial/spatial_domain/spagcn.py (SimpleGCDEC —
one GraphConvolution over exp(-d²/2l²) affinities with DEC refinement,
louvain/kmeans initialization, and the l/resolution search utilities).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dance_tpu.modules.base import BaseClusteringMethod
from dance_tpu.settings import logger
from dance_tpu.transforms import (AnnDataTransform, CellPCA, Compose, FilterGenesMatch,
                                  SetConfig)
from dance_tpu.transforms.graph import SpaGCNGraph, SpaGCNGraph2D
from dance_tpu.typing import LogLevel, Optional
from dance_tpu.utils.loss import cluster_kl_loss, target_distribution
from dance_tpu.utils.wrappers import as_numpy


def _soft_assign(z, mu, alpha: float = 0.2):
    """Reference SimpleGCDEC's q (spagcn.py:391-397): Student-t kernel with
    alpha=0.2 raised to (alpha+1) — the reference's trailing ``/2.0`` is a
    constant that cancels under row normalization, so the effective exponent
    is (alpha+1), not standard DEC's (alpha+1)/2."""
    d2 = jnp.sum((z[:, None, :] - mu[None, :, :]) ** 2, axis=-1)
    q = (1.0 / (1.0 + d2 / alpha + 1e-8)) ** (alpha + 1.0)
    return q / jnp.sum(q, axis=1, keepdims=True)


def search_l(p: float, adj: np.ndarray, start: float = 0.01, end: float = 1000,
             tol: float = 0.01, max_run: int = 100) -> float:
    """Bisection for the length scale l whose affinity mass matches p
    (parity: spagcn.py util search_l)."""

    def p_of(l):
        a = np.exp(-(adj ** 2) / (2 * l ** 2))
        return float(a.sum(1).mean() - 1)

    lo, hi = start, end
    for _ in range(max_run):
        mid = (lo + hi) / 2
        pm = p_of(mid)
        if abs(pm - p) < tol:
            return mid
        if pm > p:
            hi = mid
        else:
            lo = mid
    logger.warning("search_l did not converge; returning midpoint")
    return (lo + hi) / 2


def calculate_adj_matrix(x, y, histology: bool = False) -> np.ndarray:
    """Pairwise spot distance matrix (parity: spagcn.py:81, histology=False
    path; the histology-aware 3-d variant is the SpaGCNGraph transform)."""
    if histology:
        raise NotImplementedError(
            "histology-aware adjacency lives in transforms.graph.SpaGCNGraph")
    xy = np.stack([np.asarray(x, np.float64), np.asarray(y, np.float64)], 1)
    d2 = ((xy[:, None, :] - xy[None, :, :]) ** 2).sum(-1)
    return np.sqrt(np.maximum(d2, 0.0))


def calculate_p(adj, l) -> float:
    """Mean off-self affinity mass at length scale l (parity: spagcn.py:249)."""
    a = np.exp(-(np.asarray(adj) ** 2) / (2 * l ** 2))
    return float(a.sum(1).mean() - 1)


def _spatial_knn_w(x, y, k: int = 5) -> np.ndarray:
    """Binary kNN weight matrix over spot coordinates, zero diagonal."""
    adj = calculate_adj_matrix(x, y)
    n = adj.shape[0]
    nbrs = np.argsort(adj, axis=1)[:, :k]  # includes self (distance 0)
    w = np.zeros((n, n))
    np.put_along_axis(w, nbrs, 1.0, axis=1)
    np.fill_diagonal(w, 0.0)
    return w


def _as_gene_frame(genes_exp):
    import pandas as pd
    if not hasattr(genes_exp, "columns"):
        genes_exp = pd.DataFrame(np.asarray(genes_exp))
    return genes_exp


def Moran_I(genes_exp, x, y, k: int = 5, knn: bool = True):
    """Moran's I spatial autocorrelation per gene (parity: spagcn.py:31),
    vectorized: I_g = (n / ΣW) · (x_cᵀ W x_c) / (x_cᵀ x_c)."""
    genes_exp = _as_gene_frame(genes_exp)
    w = _spatial_knn_w(x, y, k) if knn else calculate_adj_matrix(x, y)
    xv = genes_exp.to_numpy(dtype=np.float64)
    xc = xv - xv.mean(0)
    nom = (xc * (w @ xc)).sum(0)
    den = np.maximum((xc ** 2).sum(0), 1e-12)
    vals = (len(xv) / w.sum()) * nom / den
    import pandas as pd
    return pd.Series(vals, index=genes_exp.columns)


def Geary_C(genes_exp, x, y, k: int = 5, knn: bool = True):
    """Geary's C spatial autocorrelation per gene (parity: spagcn.py:53),
    vectorized via ΣW_ij(x_i - x_j)² = rᵀx² + cᵀx² - 2·x_cᵀWx_c expansion."""
    genes_exp = _as_gene_frame(genes_exp)
    w = _spatial_knn_w(x, y, k) if knn else calculate_adj_matrix(x, y)
    xv = genes_exp.to_numpy(dtype=np.float64)
    x2 = xv ** 2
    nom = (w.sum(1) @ x2) + (w.sum(0) @ x2) - 2 * (xv * (w @ xv)).sum(0)
    xc = xv - xv.mean(0)
    den = np.maximum((xc ** 2).sum(0), 1e-12)
    vals = (len(xv) / (2 * w.sum())) * nom / den
    import pandas as pd
    return pd.Series(vals, index=genes_exp.columns)


def count_nbr(target_cluster, cell_id, x, y, pred, radius) -> float:
    """Mean number of spots within ``radius`` of each target-domain spot
    (parity: spagcn.py:119), vectorized."""
    pred = np.asarray(pred)
    adj = calculate_adj_matrix(x, y)
    target = pred == target_cluster
    return float((adj[target] <= radius).sum(1).mean())


def search_radius(target_cluster, cell_id, x, y, pred, start, end,
                  num_min: int = 8, num_max: int = 15, max_run: int = 100):
    """Bisection for a radius giving num_min..num_max mean neighbors
    (parity: spagcn.py:133)."""
    num_low = count_nbr(target_cluster, cell_id, x, y, pred, start)
    num_high = count_nbr(target_cluster, cell_id, x, y, pred, end)
    if num_min <= num_low <= num_max:
        return start
    if num_min <= num_high <= num_max:
        return end
    if num_low > num_max or num_high < num_min:
        logger.info("search_radius: adjust start/end bounds")
        return None
    for run in range(max_run):
        mid = (start + end) / 2
        num_mid = count_nbr(target_cluster, cell_id, x, y, pred, mid)
        if num_min <= num_mid <= num_max:
            logger.info("recommended radius = %s (num_nbr=%s)", mid, num_mid)
            return mid
        if num_mid < num_min:
            start, num_low = mid, num_mid
        else:
            end, num_high = mid, num_mid
    logger.info("search_radius: exact radius not found in %d runs", max_run)
    return None


def find_neighbor_clusters(target_cluster, cell_id, x, y, pred, radius,
                           ratio: float = 1 / 2):
    """Domains whose spots appear among the target domain's radius-neighbors
    more than ``ratio`` of their own size (parity: spagcn.py:170)."""
    pred = np.asarray(pred)
    adj = calculate_adj_matrix(x, y)
    target = pred == target_cluster
    within = adj[target] <= radius  # (n_target, n)
    labels, counts = np.unique(pred, return_counts=True)
    cluster_num = dict(zip(labels.tolist(), counts.tolist()))
    nbr_counts = {}
    for lab in labels:
        if lab == target_cluster:
            continue
        nbr_counts[lab] = int(within[:, pred == lab].sum())
    kept = [(k, v) for k, v in nbr_counts.items() if v > ratio * cluster_num[k]]
    kept.sort(key=lambda t: -t[1])
    if not kept:
        back = sorted(nbr_counts.items(), key=lambda t: -t[1])[:1]
        logger.info("No neighbor domain passed the ratio filter; returning "
                    "the most frequent one. Try bigger radius/smaller ratio.")
        return [back[0][0]] if back else []
    return [t[0] for t in kept]


def rank_genes_groups(input_adata, target_cluster, nbr_list, label_col,
                      adj_nbr: bool = True, log: bool = False):
    """Target-vs-neighbors differential expression table (parity:
    spagcn.py:207): Wilcoxon rank-sum p-values (BH-adjusted), in/out
    detection fractions, and fold change."""
    import pandas as pd
    from scipy.stats import ranksums

    labels = np.asarray(input_adata.obs[label_col])
    if adj_nbr:
        keep = np.isin(labels, np.asarray(list(nbr_list) + [target_cluster]))
    else:
        keep = np.ones(len(labels), bool)
    x = input_adata.X
    x = np.asarray(x.todense() if hasattr(x, "todense") else x,
                   np.float64)[keep]
    in_group = labels[keep] == target_cluster
    xi, xo = x[in_group], x[~in_group]
    pvals = np.array([ranksums(xi[:, j], xo[:, j]).pvalue
                      for j in range(x.shape[1])])
    # Benjamini-Hochberg adjustment (matches scanpy's pvals_adj)
    order = np.argsort(pvals)
    m = len(pvals)
    ranked = pvals[order] * m / np.arange(1, m + 1)
    adj = np.minimum.accumulate(ranked[::-1])[::-1]
    pvals_adj = np.empty(m)
    pvals_adj[order] = np.minimum(adj, 1.0)
    mean_in, mean_out = xi.mean(0), xo.mean(0)
    frac_in, frac_out = (xi > 0).mean(0), (xo > 0).mean(0)
    fold = (np.exp(mean_in - mean_out) if log
            else mean_in / (mean_out + 1e-9))
    genes = list(getattr(input_adata.var, "index", range(x.shape[1])))
    return pd.DataFrame({
        "genes": genes, "in_group_fraction": frac_in,
        "out_group_fraction": frac_out,
        "in_out_group_ratio": frac_in / np.maximum(frac_out, 1e-12),
        "in_group_mean_exp": mean_in, "out_group_mean_exp": mean_out,
        "fold_change": fold, "pvals_adj": pvals_adj,
    })


def refine(sample_id, pred, dis, shape: str = "hexagon"):
    """Majority-vote label smoothing over each spot's nearest neighbors
    (parity: spagcn.py:290), vectorized: a spot flips to the dominant
    neighbor label when its own label holds < half the neighborhood and some
    other label holds > half."""
    pred = np.asarray(pred)
    dis = np.asarray(dis)
    num_nbs = {"hexagon": 6, "square": 4}.get(shape)
    if num_nbs is None:
        logger.info("Shape not recognized: 'hexagon' (Visium) or 'square' (ST)")
        num_nbs = 6
    n = len(pred)
    # num_nbs+1 nearest including self (the reference keeps self in the vote)
    nbrs = np.argsort(dis, axis=1)[:, :num_nbs + 1]
    nbr_labels = pred[nbrs]  # (n, num_nbs+1)
    k = int(pred.max()) + 1
    votes = np.zeros((n, k), int)
    for j in range(nbr_labels.shape[1]):
        votes[np.arange(n), nbr_labels[:, j]] += 1
    self_votes = votes[np.arange(n), pred]
    top = votes.argmax(1)
    top_votes = votes.max(1)
    flip = (self_votes < num_nbs / 2) & (top_votes > num_nbs / 2)
    out = np.where(flip, top, pred)
    return out.tolist()


class SpaGCN(BaseClusteringMethod):
    """SpaGCN model (parity: spagcn.py:700)."""

    _DISPLAY_ATTRS = ("l",)

    def __init__(self, l: Optional[float] = None, device: str = "auto", seed: int = 0,
                 alpha: float = 0.2):
        self.l = l
        self.alpha = alpha
        self.res = None
        self.seed = seed

    @staticmethod
    def preprocessing_pipeline(alpha: float = 1, beta: int = 49, dim: int = 50,
                               log_level: LogLevel = "INFO"):
        return Compose(
            FilterGenesMatch(prefixes=["ERCC", "MT-"]),
            AnnDataTransform("sc.pp.normalize_total", target_sum=1e4),
            AnnDataTransform("sc.pp.log1p"),
            SpaGCNGraph(alpha=alpha, beta=beta),
            SpaGCNGraph2D(),
            CellPCA(n_components=dim),
            SetConfig({"feature_channel": ["CellPCA", "SpaGCNGraph", "SpaGCNGraph2D"],
                       "feature_channel_type": ["obsm", "obsp", "obsp"],
                       "label_channel": "label", "label_channel_type": "obs"}),
            log_level=log_level,
        )

    def search_l(self, p, adj, start=0.01, end=1000, tol=0.01, max_run=100):
        return search_l(p, np.asarray(adj), start, end, tol, max_run)

    def set_l(self, l):
        self.l = l

    def search_set_res(self, x, l, target_num, start: float = 0.4,
                       step: float = 0.1, tol: float = 5e-3, lr: float = 0.05,
                       epochs: int = 10, max_run: int = 10):
        """Search a louvain resolution yielding ``target_num`` clusters
        (parity: spagcn.py:771); sets and returns the recommended res."""
        res = start
        clf = SpaGCN(l, seed=self.seed)
        y_pred = clf.fit_predict(x, init_spa=True, init="louvain", res=res,
                                 tol=tol, lr=lr, epochs=epochs)
        old_num = len(set(np.asarray(y_pred).tolist()))
        logger.info("Res = %.4f, num clusters = %d", res, old_num)
        for run in range(max_run):
            if old_num == target_num:
                break
            old_sign = 1 if old_num < target_num else -1
            clf = SpaGCN(l, seed=self.seed)
            y_pred = clf.fit_predict(x, init_spa=True, init="louvain",
                                     res=res + step * old_sign, tol=tol,
                                     lr=lr, epochs=epochs)
            new_num = len(set(np.asarray(y_pred).tolist()))
            logger.info("Res = %.4e, num clusters = %d", res + step * old_sign,
                        new_num)
            if new_num == target_num:
                res = res + step * old_sign
                break
            if (1 if new_num < target_num else -1) == old_sign:
                res = res + step * old_sign
                old_num = new_num
            else:
                step /= 2
        logger.info("Recommended res = %.4f", res)
        self.res = res
        return res

    def get_svgs(self, adata, target):
        """Spatially-variable genes for one domain (parity: spagcn.py:881):
        radius search → neighbor domains → Wilcoxon DE vs neighbors →
        fraction/ratio/fold-change filters."""
        x_array = np.asarray(adata.obsm["spatial"])[:, 0]
        y_array = np.asarray(adata.obsm["spatial"])[:, 1]
        pred = np.asarray(adata.obs["pred"])
        cell_id = list(adata.obs.index)
        adj_2d = calculate_adj_matrix(x=x_array, y=y_array)
        nz = adj_2d[adj_2d != 0]
        start, end = np.quantile(nz, 0.001), np.quantile(nz, 0.1)
        r = search_radius(target, cell_id, x_array, y_array, pred, start, end,
                          num_min=10, num_max=14)
        if r is None:
            return []
        nbr_domains = find_neighbor_clusters(target, cell_id, x_array, y_array,
                                             pred, r, ratio=1 / 2)[:3]
        info = rank_genes_groups(adata, target, nbr_domains, "pred",
                                 adj_nbr=True, log=True)
        info = info[(info["pvals_adj"] < 0.05)
                    & (info["in_out_group_ratio"] > 1)
                    & (info["in_group_fraction"] > 0.8)
                    & (info["fold_change"] > 1.5)]
        info = info.sort_values(by="in_group_fraction", ascending=False)
        return info["genes"].tolist()

    def calc_adj_exp(self, adj: np.ndarray) -> np.ndarray:
        return np.exp(-(np.asarray(adj) ** 2) / (2 * self.l ** 2))

    # --- training ---------------------------------------------------------

    @partial(jax.jit, static_argnames=("self",))
    def _step(self, theta, opt_state, a_norm, x, p):
        def loss_fn(theta):
            w, mu = theta
            z = a_norm @ (x @ w)
            q = _soft_assign(z, mu, self.alpha)
            return cluster_kl_loss(p, q)

        loss, grads = jax.value_and_grad(loss_fn)(theta)
        updates, opt_state = self._tx.update(grads, opt_state, theta)
        return optax.apply_updates(theta, updates), opt_state, loss

    def fit(self, x, y=None, *, num_pcs: int = 50, lr: float = 0.005,
            epochs: int = 2000, weight_decay: float = 0, opt: str = "admin",
            init_spa: bool = True, init: str = "louvain", n_neighbors: int = 10,
            n_clusters: Optional[int] = None, res: float = 0.4, tol: float = 1e-3):
        embed, adj = x
        if self.l is None:
            raise ValueError("l must be set before fitting (use search_l/set_l)")
        embed = as_numpy(embed).astype(np.float32)
        a = self.calc_adj_exp(adj)
        a_norm = jnp.asarray(a / a.sum(1, keepdims=True), jnp.float32)
        xj = jnp.asarray(embed)

        w0 = jnp.eye(embed.shape[1], dtype=jnp.float32)
        z0 = np.asarray(a_norm @ (xj @ w0))
        # init_spa=False clusters on expression only, ignoring the spatial
        # propagation (parity: spagcn.py:475-487)
        init_feats = z0 if init_spa else embed

        # initialize cluster assignment
        if init == "louvain":
            from dance_tpu.ops.cluster import louvain
            from dance_tpu.ops.neighbors import knn_graph
            g = knn_graph(init_feats, min(n_neighbors, len(init_feats) - 1),
                          mode="connectivity", include_self=False)
            y0 = louvain(g, resolution=res, seed=self.seed)
        else:
            from dance_tpu.ops.cluster import kmeans
            y0 = np.asarray(kmeans(init_feats, n_clusters or 10,
                                   seed=self.seed).labels)
        k = int(y0.max()) + 1
        mu0 = np.stack([z0[y0 == c].mean(0) if (y0 == c).any() else z0.mean(0)
                        for c in range(k)])

        theta = (w0, jnp.asarray(mu0, jnp.float32))
        # opt/weight_decay mirror the reference's optimizer knobs (:427,:467)
        if opt == "sgd":
            self._tx = optax.chain(optax.add_decayed_weights(weight_decay),
                                   optax.sgd(lr, momentum=0.9))
        else:
            self._tx = (optax.adamw(lr, weight_decay=weight_decay)
                        if weight_decay else optax.adam(lr))
        opt_state = self._tx.init(theta)
        y_last = y0
        for epoch in range(epochs):
            if epoch % 3 == 0:
                w, mu = theta
                z = a_norm @ (xj @ w)
                q = _soft_assign(z, mu, self.alpha)
                p = target_distribution(q)
                y_now = np.asarray(q.argmax(1))
                delta = (y_now != y_last).mean()
                y_last = y_now
                if epoch > 0 and delta < tol:
                    break
            theta, opt_state, loss = self._step(theta, opt_state, a_norm, xj, p)
        self._theta = theta
        self._a_norm = a_norm
        return self

    def predict_proba(self, x):
        embed, adj = x
        a = self.calc_adj_exp(adj)
        a_norm = jnp.asarray(a / a.sum(1, keepdims=True), jnp.float32)
        w, mu = self._theta
        z = a_norm @ (jnp.asarray(as_numpy(embed), jnp.float32) @ w)
        return np.asarray(_soft_assign(z, mu, self.alpha))

    def predict(self, x):
        return self.predict_proba(x).argmax(1)

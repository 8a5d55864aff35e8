"""Preprocessing functions with scanpy-parity semantics.

Each function mirrors the scanpy signature subset the reference exercises
(SURVEY.md §2.3 'interface' scope). Algorithms follow the published scanpy
implementations; deviations are documented per-function.
"""

from typing import Optional

import numpy as np
import pandas as pd
import scipy.sparse as sp

from dance_tpu.settings import logger


def _dense(X):
    return X.toarray() if sp.issparse(X) else np.asarray(X)


def _row_sums(X):
    return np.asarray(X.sum(axis=1)).ravel()


def _col_sums(X):
    return np.asarray(X.sum(axis=0)).ravel()


# --------------------------------------------------------------------------
# Filtering
# --------------------------------------------------------------------------

def filter_cells(adata, *, min_counts: Optional[int] = None, min_genes: Optional[int] = None,
                 max_counts: Optional[int] = None, max_genes: Optional[int] = None,
                 inplace: bool = True):
    """Keep cells passing count/gene thresholds (scanpy.pp.filter_cells parity).

    Exactly one option should be set per call (scanpy convention)."""
    opts = [min_counts, min_genes, max_counts, max_genes]
    if sum(o is not None for o in opts) != 1:
        raise ValueError("Provide exactly one of min_counts/min_genes/max_counts/max_genes")
    X = adata.X
    if min_counts is not None or max_counts is not None:
        metric = _row_sums(X)
    else:
        metric = _row_sums(X > 0) if sp.issparse(X) else (np.asarray(X) > 0).sum(1)
    if min_counts is not None:
        mask = metric >= min_counts
    elif max_counts is not None:
        mask = metric <= max_counts
    elif min_genes is not None:
        mask = metric >= min_genes
    else:
        mask = metric <= max_genes
    if not inplace:
        return mask, metric
    _subset_obs(adata, mask)
    if min_counts is not None or max_counts is not None:
        adata.obs["n_counts"] = metric[mask]
    else:
        adata.obs["n_genes"] = metric[mask]
    return None


def filter_genes(adata, *, min_counts: Optional[int] = None, min_cells: Optional[int] = None,
                 max_counts: Optional[int] = None, max_cells: Optional[int] = None,
                 inplace: bool = True):
    """Keep genes passing count/cell thresholds (scanpy.pp.filter_genes parity)."""
    opts = [min_counts, min_cells, max_counts, max_cells]
    if sum(o is not None for o in opts) != 1:
        raise ValueError("Provide exactly one of min_counts/min_cells/max_counts/max_cells")
    X = adata.X
    if min_counts is not None or max_counts is not None:
        metric = _col_sums(X)
    else:
        metric = _col_sums(X > 0) if sp.issparse(X) else (np.asarray(X) > 0).sum(0)
    if min_counts is not None:
        mask = metric >= min_counts
    elif max_counts is not None:
        mask = metric <= max_counts
    elif min_cells is not None:
        mask = metric >= min_cells
    else:
        mask = metric <= max_cells
    if not inplace:
        return mask, metric
    _subset_var(adata, mask)
    if min_counts is not None or max_counts is not None:
        adata.var["n_counts"] = metric[mask]
    else:
        adata.var["n_cells"] = metric[mask]
    return None


def _subset_obs(adata, mask):
    sub = adata[np.asarray(mask, dtype=bool)]
    _copy_into(adata, sub)


def _subset_var(adata, mask):
    sub = adata[:, np.asarray(mask, dtype=bool)]
    _copy_into(adata, sub)


def _copy_into(adata, sub):
    adata._X = sub.X
    adata.obs = sub.obs
    adata.var = sub.var
    for attr in ("obsm", "varm", "obsp", "varp", "layers"):
        getattr(adata, attr).clear()
        getattr(adata, attr).update(getattr(sub, attr))


# --------------------------------------------------------------------------
# Normalization
# --------------------------------------------------------------------------

def normalize_total(adata, *, target_sum: Optional[float] = None,
                    exclude_highly_expressed: bool = False, max_fraction: float = 0.05,
                    key_added: Optional[str] = None, inplace: bool = True):
    """Library-size normalization (scanpy.pp.normalize_total parity).

    target_sum=None normalizes to the median of per-cell counts."""
    X = adata.X
    counts = _row_sums(X)
    if exclude_highly_expressed:
        # genes taking >max_fraction of any cell's counts are excluded from the
        # size-factor computation (but still scaled)
        if sp.issparse(X):
            frac = X.multiply(1.0 / np.maximum(counts, 1e-12)[:, None]).tocsc()
            hi = np.asarray((frac > max_fraction).sum(axis=0)).ravel() > 0
        else:
            frac = np.asarray(X) / np.maximum(counts, 1e-12)[:, None]
            hi = (frac > max_fraction).any(axis=0)
        counts = _row_sums(X[:, ~hi] if not sp.issparse(X) else X[:, np.nonzero(~hi)[0]])
        logger.info("normalize_total excluded %d highly-expressed genes", int(hi.sum()))
    tsum = np.median(counts[counts > 0]) if target_sum is None else target_sum
    scale = np.divide(tsum, counts, out=np.ones_like(counts, dtype=np.float64),
                      where=counts > 0)
    if not inplace:
        out = sp.diags(scale) @ sp.csr_matrix(X) if sp.issparse(X) else _dense(X) * scale[:, None]
        return {"X": out, "norm_factor": counts / tsum}
    if key_added is not None:
        adata.obs[key_added] = counts / tsum
    if sp.issparse(X):
        adata._X = (sp.diags(scale) @ X).tocsr().astype(np.float32)
    else:
        adata._X = (np.asarray(X, dtype=np.float64) * scale[:, None]).astype(np.float32)
    return None


def normalize_per_cell(adata, *, counts_per_cell_after: Optional[float] = None,
                       min_counts: int = 1):
    """Legacy scanpy normalize_per_cell: filters cells below min_counts then
    scales to counts_per_cell_after (default: mean of counts)."""
    counts = _row_sums(adata.X)
    if min_counts is not None and (counts < min_counts).any():
        _subset_obs(adata, counts >= min_counts)
        counts = counts[counts >= min_counts]
    target = counts_per_cell_after if counts_per_cell_after is not None else counts.mean()
    adata.obs["n_counts"] = counts
    scale = target / np.maximum(counts, 1e-12)
    X = adata.X
    if sp.issparse(X):
        adata._X = (sp.diags(scale) @ X).tocsr().astype(np.float32)
    else:
        adata._X = (np.asarray(X) * scale[:, None]).astype(np.float32)
    return None


def log1p(adata, *, base: Optional[float] = None):
    X = adata.X
    if sp.issparse(X):
        X = X.copy()
        X.data = np.log1p(X.data)
        if base is not None:
            X.data /= np.log(base)
        adata._X = X
    else:
        out = np.log1p(np.asarray(X))
        if base is not None:
            out /= np.log(base)
        adata._X = out.astype(np.float32)
    adata.uns["log1p"] = {"base": base}
    return None


def scale(adata, *, zero_center: bool = True, max_value: Optional[float] = None):
    """Per-gene standardization (scanpy.pp.scale parity; densifies)."""
    X = _dense(adata.X).astype(np.float64)
    mean = X.mean(axis=0)
    std = X.std(axis=0, ddof=1)
    std[std == 0] = 1.0
    if zero_center:
        X = X - mean
    X /= std
    if max_value is not None:
        X = np.clip(X, -max_value if zero_center else None, max_value)
    adata._X = X.astype(np.float32)
    adata.var["mean"] = mean
    adata.var["std"] = std
    return None


# --------------------------------------------------------------------------
# Highly variable genes
# --------------------------------------------------------------------------

def _loess(x: np.ndarray, y: np.ndarray, *, span: float = 0.3, degree: int = 2,
           block: int = 2048) -> np.ndarray:
    """Loess smoother: local weighted polynomial regression with tricube weights.

    For sorted x the span-nearest neighbors of each point are a contiguous
    window, so windows come from a two-pointer sweep and the per-point weighted
    least-squares solves batch into (block, degree+1, degree+1) normal
    equations. Centering the design at each query point makes the intercept
    the prediction. Host-side numpy (runs once per HVG call, not in jit).
    """
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    n = len(x)
    k = min(max(int(np.ceil(span * n)), degree + 2), n)
    order = np.argsort(x, kind="stable")
    xs, ys = x[order], y[order]
    starts = np.empty(n, np.int64)
    lo = 0
    for i in range(n):
        while lo + k < n and xs[lo + k] - xs[i] < xs[i] - xs[lo]:
            lo += 1
        starts[i] = lo
    idx = starts[:, None] + np.arange(k)[None]
    out = np.empty(n)
    eye = 1e-10 * np.eye(degree + 1)
    for s in range(0, n, block):
        sl = slice(s, min(s + block, n))
        Xw, Yw = xs[idx[sl]], ys[idx[sl]]
        xc = Xw - xs[sl, None]
        d = np.abs(xc)
        dmax = d.max(1, keepdims=True)
        dmax[dmax == 0] = 1.0
        w = (1 - np.minimum(d / dmax, 1.0) ** 3) ** 3
        A = np.stack([xc ** p for p in range(degree + 1)], axis=-1)
        Aw = A * w[..., None]
        G = np.einsum("bki,bkj->bij", Aw, A) + eye
        rhs = np.einsum("bki,bk->bi", Aw, Yw)
        out[sl] = np.linalg.solve(G, rhs[..., None])[:, 0, 0]
    res = np.empty(n)
    res[order] = out
    return res


def highly_variable_genes(adata, *, flavor: str = "seurat", n_top_genes: Optional[int] = None,
                          min_mean: float = 0.0125, max_mean: float = 3.0,
                          min_disp: float = 0.5, max_disp: float = np.inf,
                          n_bins: int = 20, span: float = 0.3, subset: bool = False,
                          batch_key: Optional[str] = None, check_values: bool = True,
                          inplace: bool = True):
    if batch_key is not None:
        # scanpy batch semantics: HVG per batch, rank genes by the number of
        # batches in which they are highly variable (ties by mean dispersion)
        batches = np.asarray(adata.obs[batch_key])
        n_batches_hv = np.zeros(adata.n_vars)
        disp_sum = np.zeros(adata.n_vars)
        for b in np.unique(batches):
            sub = adata[batches == b]
            res = highly_variable_genes(sub, flavor=flavor, n_top_genes=n_top_genes,
                                        min_mean=min_mean, max_mean=max_mean,
                                        min_disp=min_disp, max_disp=max_disp,
                                        n_bins=n_bins, span=span, subset=False,
                                        inplace=False)
            n_batches_hv += res["highly_variable"].to_numpy().astype(float)
            key = ("dispersions_norm" if "dispersions_norm" in res.columns
                   else "variances_norm")
            disp_sum += np.nan_to_num(res[key].to_numpy())
        order = np.lexsort((-disp_sum, -n_batches_hv))
        hv = np.zeros(adata.n_vars, dtype=bool)
        k = n_top_genes if n_top_genes is not None else int((n_batches_hv > 0).sum())
        hv[order[:k]] = True
        result = {"highly_variable": hv, "highly_variable_nbatches": n_batches_hv}
        if not inplace:
            return pd.DataFrame(result, index=adata.var_names)
        for key, val in result.items():
            adata.var[key] = val
        if subset:
            _subset_var(adata, hv)
        return None
    """HVG selection, scanpy-parity flavors.

    - ``seurat`` (default; expects log data): dispersion = var/mean of expm1
      data, z-scored within 20 mean-bins, cutoff selection.
    - ``cell_ranger`` (expects log data): median/MAD-normalized dispersion in
      percentile mean-bins, top-n selection.
    - ``seurat_v3`` (expects raw counts): variance-stabilizing standardized
      variance; the mean-variance trend is fit with loess (span=0.3, degree=2
      in log10 space, tricube weights) matching scanpy's skmisc.loess usage.
    """
    X = adata.X
    if flavor in ("seurat", "cell_ranger"):
        Xe = X.copy()
        if sp.issparse(Xe):
            Xe.data = np.expm1(Xe.data)
        else:
            Xe = np.expm1(np.asarray(Xe, dtype=np.float64))
        mean = np.asarray(Xe.mean(axis=0)).ravel()
        if sp.issparse(Xe):
            mean_sq = np.asarray(Xe.multiply(Xe).mean(axis=0)).ravel()
        else:
            mean_sq = np.asarray((Xe ** 2).mean(axis=0)).ravel()
        n = X.shape[0]
        var = (mean_sq - mean ** 2) * (n / max(n - 1, 1))
        mean[mean == 0] = 1e-12
        dispersion = var / mean
        if flavor == "seurat":
            dispersion[dispersion == 0] = np.nan
            dispersion = np.log(dispersion)
            mean = np.log1p(mean)
        df = pd.DataFrame({"means": mean, "dispersions": dispersion})
        if flavor == "seurat":
            df["mean_bin"] = pd.cut(df["means"], bins=n_bins)
            grouped = df.groupby("mean_bin", observed=True)["dispersions"]
            bin_mean = grouped.transform("mean")
            bin_std = grouped.transform("std")
            # singleton bins get std nan -> use bin mean trick like scanpy:
            # treat their dispersion as high (they're their own bin)
            bin_std = bin_std.fillna(0)
            disp_norm = (df["dispersions"] - bin_mean) / bin_std.replace(0, np.nan)
            disp_norm = disp_norm.fillna(df["dispersions"] - bin_mean).to_numpy()
        else:  # cell_ranger
            df["mean_bin"] = pd.cut(df["means"], bins=np.r_[
                -np.inf, np.percentile(df["means"], np.arange(10, 105, 5)), np.inf])
            grouped = df.groupby("mean_bin", observed=True)["dispersions"]
            bin_median = grouped.transform("median")
            abs_dev = (df["dispersions"] - bin_median).abs()
            bin_mad = abs_dev.groupby(df["mean_bin"], observed=True).transform("median")
            disp_norm = ((df["dispersions"] - bin_median) / bin_mad.replace(0, np.nan))
            disp_norm = disp_norm.fillna(0).to_numpy()
        if n_top_genes is not None:
            cut = np.sort(disp_norm[~np.isnan(disp_norm)])[::-1][
                min(n_top_genes, np.isfinite(disp_norm).sum()) - 1]
            hv = disp_norm >= cut
        else:
            hv = ((mean > min_mean) & (mean < max_mean)
                  & (disp_norm > min_disp) & (disp_norm < max_disp))
        hv = np.nan_to_num(hv.astype(float)).astype(bool)
        result = {"highly_variable": hv, "means": mean, "dispersions": df["dispersions"].
                  to_numpy(), "dispersions_norm": disp_norm}
    elif flavor == "seurat_v3":
        if n_top_genes is None:
            n_top_genes = 2000
        if check_values:
            sample = (X.data[:100] if sp.issparse(X)
                      else np.asarray(X).ravel()[:1000])
            if not np.allclose(sample, np.round(sample)):
                logger.warning("`flavor='seurat_v3'` expects raw count data, "
                               "but non-integers were found.")
        Xd = X
        mean = np.asarray(Xd.mean(axis=0)).ravel()
        if sp.issparse(Xd):
            mean_sq = np.asarray(Xd.multiply(Xd).mean(axis=0)).ravel()
        else:
            mean_sq = np.asarray((np.asarray(Xd) ** 2).mean(axis=0)).ravel()
        n = X.shape[0]
        var = (mean_sq - mean ** 2) * (n / max(n - 1, 1))
        not_const = var > 0
        est_var = np.zeros_like(var)
        lx, ly = np.log10(mean[not_const]), np.log10(var[not_const])
        est_var[not_const] = 10 ** _loess(lx, ly, span=0.3, degree=2)
        std_expect = np.sqrt(est_var)
        clip = np.sqrt(n)
        std_var = np.zeros_like(var)
        with np.errstate(divide="ignore", invalid="ignore"):
            Xd_d = _dense(Xd).astype(np.float64)
            zs = np.where(std_expect > 0, (Xd_d - mean) / np.where(std_expect == 0, 1,
                                                                   std_expect), 0.0)
            zs = np.clip(zs, -clip, clip)
            std_var = (zs ** 2).sum(0) / (n - 1)
        rank = np.argsort(np.argsort(-std_var))
        hv = rank < n_top_genes
        result = {"highly_variable": hv, "means": mean, "variances": var,
                  "variances_norm": std_var}
    else:
        raise ValueError(f"Unknown flavor {flavor!r}")

    if not inplace:
        return pd.DataFrame(result, index=adata.var_names)
    for k, v in result.items():
        adata.var[k] = v
    if subset:
        _subset_var(adata, result["highly_variable"])
    return None


# --------------------------------------------------------------------------
# QC / graphs / batch correction
# --------------------------------------------------------------------------

def calculate_qc_metrics(adata, *, percent_top=(50, 100, 200, 500), inplace: bool = True):
    X = adata.X
    n_genes = np.asarray((X > 0).sum(axis=1)).ravel()
    total = _row_sums(X)
    adata.obs["n_genes_by_counts"] = n_genes
    adata.obs["total_counts"] = total
    if percent_top:
        # scanpy's pct_counts_in_top_N_genes: share of each cell's counts in
        # its N most-expressed genes
        dense = _dense(X)
        tops = sorted(int(t) for t in percent_top if t <= X.shape[1])
        if tops:
            part = -np.sort(-dense, axis=1)[:, :max(tops)]
            csum = np.cumsum(part, axis=1)
            denom = np.maximum(total, 1e-12)
            for t in tops:
                adata.obs[f"pct_counts_in_top_{t}_genes"] = (
                    csum[:, t - 1] / denom * 100.0)
    adata.var["n_cells_by_counts"] = np.asarray((X > 0).sum(axis=0)).ravel()
    adata.var["total_counts"] = _col_sums(X)
    adata.var["mean_counts"] = adata.var["total_counts"] / X.shape[0]
    return None if inplace else (adata.obs, adata.var)


def neighbors(adata, *, n_neighbors: int = 15, n_pcs: Optional[int] = None,
              use_rep: Optional[str] = None, metric: str = "euclidean",
              random_state: int = 0):
    """kNN graph into obsp['distances'/'connectivities'] (scanpy parity shape)."""
    from dance_tpu.ops.neighbors import knn
    if use_rep is not None and use_rep in adata.obsm:
        rep = np.asarray(adata.obsm[use_rep])
    elif "X_pca" in adata.obsm:
        rep = np.asarray(adata.obsm["X_pca"])
    else:
        rep = _dense(adata.X)
    if n_pcs is not None:
        if rep.shape[1] > n_pcs and use_rep is None and "X_pca" not in adata.obsm:
            pca(adata, n_comps=n_pcs)
            rep = np.asarray(adata.obsm["X_pca"])
        else:
            rep = rep[:, :n_pcs]
    d, i = knn(rep.astype(np.float32), n_neighbors, include_self=True)
    n = rep.shape[0]
    rows = np.repeat(np.arange(n), i.shape[1])
    dist = sp.csr_matrix((d.ravel(), (rows, i.ravel())), shape=(n, n))
    # gaussian-ish connectivity kernel (umap's exact kernel not replicated)
    sigma = np.maximum(d[:, -1:], 1e-12)
    conn_vals = np.exp(-((d / sigma) ** 2)).ravel()
    conn = sp.csr_matrix((conn_vals, (rows, i.ravel())), shape=(n, n))
    conn = conn.maximum(conn.T)
    conn.setdiag(0)
    conn.eliminate_zeros()
    adata.obsp["distances"] = dist
    adata.obsp["connectivities"] = conn
    adata.uns["neighbors"] = {"params": {"n_neighbors": n_neighbors, "metric": metric,
                                         "method": "dance_tpu-exact"}}
    return None


def pca(adata, *, n_comps: int = 50, zero_center: bool = True, random_state: int = 0):
    from dance_tpu.ops.linalg import pca as _pca, svd_embedding
    X = _dense(adata.X).astype(np.float32)
    n_comps = min(n_comps, min(X.shape) - 1)
    if zero_center:
        res = _pca(X, n_comps, seed=random_state)
        adata.obsm["X_pca"] = np.asarray(res.embedding)
        adata.varm["PCs"] = np.asarray(res.components).T
        adata.uns["pca"] = {"variance": np.asarray(res.explained_variance)}
    else:
        emb, comps = svd_embedding(X, n_comps, seed=random_state)
        adata.obsm["X_pca"] = np.asarray(emb)
        adata.varm["PCs"] = np.asarray(comps).T
    return None


def regress_out(adata, keys):
    """Remove linear effects of obs covariates per gene (scanpy parity, OLS)."""
    if isinstance(keys, str):
        keys = [keys]
    X = _dense(adata.X).astype(np.float64)
    covs = np.column_stack([pd.to_numeric(adata.obs[k]).to_numpy() for k in keys])
    A = np.column_stack([np.ones(len(X)), covs])
    beta, *_ = np.linalg.lstsq(A, X, rcond=None)
    adata._X = (X - A @ beta + beta[0]).astype(np.float32)
    return None


def combat(adata, key: str = "batch"):
    """Batch correction — location/scale adjustment per batch per gene.

    Simplified ComBat (no empirical-Bayes shrinkage): standardize each gene
    within batch to the pooled mean/variance. Captures the bulk of ComBat's
    location-scale correction for the pipeline-search use case."""
    X = _dense(adata.X).astype(np.float64)
    batches = np.asarray(adata.obs[key])
    grand_mean = X.mean(axis=0)
    grand_std = X.std(axis=0)
    grand_std[grand_std == 0] = 1
    out = X.copy()
    for b in np.unique(batches):
        m = batches == b
        bm = X[m].mean(axis=0)
        bs = X[m].std(axis=0)
        bs[bs == 0] = 1
        out[m] = (X[m] - bm) / bs * grand_std + grand_mean
    adata._X = out.astype(np.float32)
    return None


def scrublet(adata, *, sim_doublet_ratio: float = 2.0, n_neighbors: Optional[int] = None,
             expected_doublet_rate: float = 0.05, threshold: Optional[float] = None,
             random_state: int = 0):
    """Doublet detection (scanpy.pp.scrublet parity surface).

    Simulates doublets by summing random cell pairs, embeds observed+simulated
    cells with PCA, and scores each observed cell by the fraction of simulated
    doublets among its kNN — the core of the Scrublet algorithm. Writes
    ``obs['doublet_score']`` and ``obs['predicted_doublet']``."""
    from dance_tpu.ops.linalg import pca as _pca, pca_transform
    from dance_tpu.ops.neighbors import knn

    rng = np.random.default_rng(random_state)
    X = _dense(adata.X).astype(np.float64)
    n = X.shape[0]
    counts = X.sum(1, keepdims=True)
    norm = np.log1p(X / np.maximum(counts, 1e-12) * 1e4)
    n_sim = int(n * sim_doublet_ratio)
    i1, i2 = rng.integers(0, n, n_sim), rng.integers(0, n, n_sim)
    sim = X[i1] + X[i2]
    sim = np.log1p(sim / np.maximum(sim.sum(1, keepdims=True), 1e-12) * 1e4)
    res = _pca(norm.astype(np.float32), min(30, min(norm.shape) - 1))
    emb_obs = np.asarray(res.embedding)
    emb_sim = np.asarray(pca_transform(sim.astype(np.float32), res))
    all_emb = np.concatenate([emb_obs, emb_sim], axis=0)
    k = n_neighbors or int(round(0.5 * np.sqrt(n)))
    k = max(k, 3)
    k_adj = int(round(k * (1 + sim_doublet_ratio)))
    _, idx = knn(all_emb, min(k_adj + 1, len(all_emb)))
    nbr_is_sim = (idx[:n, 1:] >= n).mean(axis=1)
    rho = sim_doublet_ratio
    q = (nbr_is_sim * k_adj + 1) / (k_adj + 2)  # bayesian smoothing
    score = q * expected_doublet_rate / rho / (
        1 - expected_doublet_rate - q * (1 - expected_doublet_rate - expected_doublet_rate / rho))
    score = np.clip(score, 0, 1)
    thr = threshold if threshold is not None else max(np.percentile(score, 90), 0.3)
    adata.obs["doublet_score"] = score
    adata.obs["predicted_doublet"] = score > thr
    adata.uns["scrublet"] = {"threshold": float(thr)}
    return None


def subsample(adata, *, fraction: Optional[float] = None, n_obs: Optional[int] = None,
              random_state: int = 0):
    rng = np.random.default_rng(random_state)
    n = adata.n_obs
    size = n_obs if n_obs is not None else int(n * fraction)
    idx = np.sort(rng.choice(n, size=size, replace=False))
    _subset_obs(adata, np.isin(np.arange(n), idx))
    return None

"""Normalization transforms (parity: dance/transforms/normalize.py).

Registered under ``preprocessor.normalize``. Hot math (ScTransform residuals,
tf-idf) runs in JAX.
"""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from dance_tpu.registry import register_preprocessor
from dance_tpu.transforms.base import BaseTransform
from dance_tpu.transforms.interface import AnnDataTransform
from dance_tpu.typing import List, Literal, Number, Optional, Union
from dance_tpu.utils.matrix import normalize as matrix_normalize
from dance_tpu.utils.wrappers import add_mod_and_transform


@register_preprocessor("normalize")
@add_mod_and_transform
class ColumnSumNormalize(BaseTransform):
    """Axis-wise scaling with split- or batch-wide modes (parity: normalize.py:26)."""

    _DISPLAY_ATTRS = ("axis", "mode", "eps", "split_names", "batch_key")

    def __init__(self, *, axis: int = 0,
                 split_names: Optional[Union[Literal["ALL"], List[str]]] = None,
                 batch_key: Optional[str] = None, mode: str = "normalize",
                 eps: float = -1.0, **kwargs):
        super().__init__(**kwargs)
        self.axis = axis
        self.split_names = split_names
        self.batch_key = batch_key
        self.mode = mode
        self.eps = eps

    def _groups(self, data):
        if self.batch_key is not None:
            if self.split_names is not None:
                raise ValueError("Only one of batch_key / split_names may be set")
            batches = np.asarray(data.data.obs[self.batch_key])
            return [np.nonzero(batches == b)[0] for b in np.unique(batches)]
        if self.split_names is None:
            return [np.arange(data.shape[0])]
        names = (list(data.splits) if self.split_names == "ALL" else self.split_names)
        return [np.asarray(data.get_split_idx(n, error_on_miss=True)) for n in names]

    def __call__(self, data):
        X = data.data.X
        if sp.issparse(X):
            X = X.toarray()
        X = np.asarray(X, dtype=np.float32)
        for idx in self._groups(data):
            X[idx] = matrix_normalize(X[idx], mode=self.mode, axis=self.axis, eps=self.eps)
        data.data.X = X
        return data


@register_preprocessor("normalize")
@add_mod_and_transform
class tfidfTransform(BaseTransform):
    """TF-IDF weighting for ATAC peak matrices (parity: normalize.py:177)."""

    def __init__(self, **kwargs):
        super().__init__(**kwargs)

    def __call__(self, data):
        X = data.data.X
        dense = X.toarray() if sp.issparse(X) else np.asarray(X)
        out = np.asarray(_tfidf_jit(jnp.asarray(dense, jnp.float32)))
        data.data.X = out
        return data


@jax.jit
def _tfidf_jit(x):
    tf = x / jnp.maximum(x.sum(axis=1, keepdims=True), 1e-12)
    idf = x.shape[0] / jnp.maximum(x.sum(axis=0, keepdims=True), 1e-12)
    return tf * idf


@register_preprocessor("normalize")
@add_mod_and_transform
class ScTransform(BaseTransform):
    """ScTransform normalization / variance stabilization.

    Parity target: the Python ScTransform port (normalize.py:205-440). The
    default ``flavor="glm"`` reproduces the reference pipeline: per-gene
    Poisson GLM of counts on [1, log10(umi)] with ML inverse-dispersion
    (``theta_ml``), robust-scale outlier removal, kernel-regression
    regularization of the parameters over log-geometric-mean expression, and
    clipped Pearson residuals at nonzero entries (negatives zeroed, clip
    sqrt(n/30)). The per-gene GLM + theta Newton solves are vectorized over
    ALL genes simultaneously in JAX — the reference fans out a process pool
    per 500-gene bin (normalize.py:337); here one jitted IRLS program covers
    the whole matrix. Deviation: bandwidths use Silverman's rule (the
    reference's KDEpy ISJ estimator is not available offline).

    ``flavor="analytic"`` keeps the closed-form analytic Pearson residuals
    (Lause et al. 2021) with a shared ``theta`` — the fast path when per-gene
    regularized parameters are not needed.
    """

    _DISPLAY_ATTRS = ("min_cells", "flavor", "n_genes", "bw_adjust")

    def __init__(self, split_names=None, batch_key: Optional[str] = None,
                 min_cells: int = 5, gmean_eps: float = 1.0,
                 n_genes: Optional[int] = 2000, n_cells: Optional[int] = None,
                 bin_size: int = 500, bw_adjust: float = 3.0,
                 processes_num: Optional[int] = None, *,
                 flavor: str = "glm", theta: float = 100.0,
                 clip: Optional[float] = None, **kwargs):
        super().__init__(**kwargs)
        self.min_cells = min_cells
        self.gmean_eps = gmean_eps
        self.n_genes = n_genes
        self.n_cells = n_cells
        self.bw_adjust = bw_adjust
        self.flavor = flavor
        self.theta = theta
        self.clip = clip

    def __call__(self, data):
        adata = data.data
        X = adata.X
        dense = np.asarray(X.toarray() if sp.issparse(X) else X, np.float64)
        if self.flavor == "analytic":
            keep = (dense > 0).sum(axis=0) >= self.min_cells
            if not keep.all():
                from dance_tpu.sc.pp import _subset_var
                _subset_var(adata, keep)
                dense = dense[:, keep]
            clip = (self.clip if self.clip is not None
                    else float(np.sqrt(dense.shape[0])))
            adata.X = np.asarray(_pearson_residuals(
                jnp.asarray(dense, jnp.float32), self.theta, clip))
            return data
        return self._glm_call(data, dense)

    def _glm_call(self, data, dense):
        adata = data.data
        n, g_all = dense.shape
        counts_per_gene = dense.sum(0)
        genes_ix = np.where(counts_per_gene >= self.min_cells)[0]
        x = dense[:, genes_ix]
        genes_log_gmean = np.log10(gmean(x, axis=0, eps=self.gmean_eps))

        umi = x.sum(1)
        log_umi = np.log10(np.maximum(umi, 1.0))
        gene_cnt = (x > 0).sum(1)
        umi_per_gene = umi / np.maximum(gene_cnt, 1)
        cell_attrs = {
            "umi": umi, "log_umi": log_umi, "gene": gene_cnt.astype(float),
            "log_gene": np.log10(np.maximum(gene_cnt, 1)),
            "umi_per_gene": umi_per_gene,
            "log_umi_per_gene": np.log10(np.maximum(umi_per_gene, 1e-12)),
        }

        # step-1 gene subset, density-balanced (normalize.py:339-351)
        genes_step1 = np.arange(x.shape[1])
        log_gmean_step1 = genes_log_gmean
        if self.n_genes is not None and self.n_genes < genes_step1.size:
            from scipy import stats
            dens = stats.gaussian_kde(log_gmean_step1, bw_method="scott")
            xlo = np.linspace(log_gmean_step1.min(), log_gmean_step1.max(), 512)
            prob = 1.0 / (np.interp(log_gmean_step1, xlo, dens.evaluate(xlo))
                          + np.finfo(float).eps)
            genes_step1 = np.sort(np.random.choice(
                genes_step1, size=self.n_genes, p=prob / prob.sum(),
                replace=False))
            log_gmean_step1 = genes_log_gmean[genes_step1]

        # vectorized per-gene Poisson GLM + theta ML (one jitted program)
        y1 = jnp.asarray(x[:, genes_step1], jnp.float32)
        u = jnp.asarray(log_umi, jnp.float32)
        beta, theta = _poisson_glm_theta(y1, u)
        beta = np.asarray(beta, np.float64)
        theta = np.maximum(np.asarray(theta, np.float64), 1e-7)
        dispersion = np.log10(1 + 10 ** log_gmean_step1 / theta)
        pars = np.column_stack([beta, dispersion])  # Intercept, log_umi, disp

        # robust outlier filter (normalize.py:462)
        outliers = np.zeros(len(genes_step1), bool)
        for j in range(pars.shape[1]):
            outliers |= is_outlier(pars[:, j], log_gmean_step1)
        keep1 = ~outliers
        pars, genes_step1 = pars[keep1], genes_step1[keep1]
        log_gmean_step1 = log_gmean_step1[keep1]

        # kernel-regression regularization over log-gmean (normalize.py:393)
        bw = _bw_silverman(log_gmean_step1) * self.bw_adjust
        x_points = np.clip(genes_log_gmean, log_gmean_step1.min(),
                           log_gmean_step1.max())
        full = np.column_stack([
            _kernel_reg_ll(pars[:, j], log_gmean_step1, x_points, bw)
            for j in range(pars.shape[1])])
        theta_full = 10 ** genes_log_gmean / (10 ** full[:, 2] - 1)
        theta_full = np.maximum(theta_full, 1e-7)

        # Pearson residuals at nonzero entries; negatives zeroed; clipped
        mu = np.exp(full[:, 0][None, :] + full[:, 1][None, :] * log_umi[:, None])
        var = mu + mu ** 2 / theta_full[None, :]
        resid = (x - mu) / np.sqrt(var)
        resid[x == 0] = 0.0
        resid[resid < 0] = 0.0
        resid = np.minimum(resid, np.sqrt(n / 30))

        out = np.zeros((n, g_all), np.float32)
        out[:, genes_ix] = resid
        adata.raw = adata.copy()
        adata.X = out

        def full_len(vals, idx):
            a = np.full(g_all, np.nan)
            a[genes_ix[idx]] = vals
            return a

        all_idx = np.arange(len(genes_ix))
        for j, name in enumerate(("Intercept", "log_umi")):
            adata.var[name + "_sct"] = full_len(full[:, j], all_idx)
            adata.var[name + "_step1_sct"] = full_len(pars[:, j], genes_step1)
        adata.var["theta_sct"] = full_len(theta_full, all_idx)
        adata.var["dispersion_step1_sct"] = full_len(pars[:, 2], genes_step1)
        adata.var["genes_step1_sct"] = full_len(
            np.ones(len(genes_step1)), genes_step1)
        adata.var["log10_gmean_sct"] = full_len(genes_log_gmean, all_idx)
        for name, vals in cell_attrs.items():
            adata.obs[name + "_sct"] = vals
        return data


@jax.jit
def _pearson_residuals(x, theta, clip):
    cell_counts = x.sum(axis=1, keepdims=True)
    gene_frac = x.sum(axis=0, keepdims=True) / jnp.maximum(x.sum(), 1e-12)
    mu = cell_counts * gene_frac
    resid = (x - mu) / jnp.sqrt(mu + mu ** 2 / theta + 1e-12)
    return jnp.clip(resid, -clip, clip)


def gmean(X, axis=0, eps=1):
    """Geometric mean with the reference's sparse-data convention: zeros
    contribute 0 (not log(eps)) to the log-sum (parity: normalize.py:442)."""
    if sp.issparse(X):
        X = X.copy()
        X.data = np.log(X.data + eps)
        return np.exp(np.asarray(X.mean(axis)).ravel()) - eps
    X = np.asarray(X, np.float64)
    logs = np.where(X != 0, np.log(X + eps), 0.0)
    return np.exp(logs.mean(axis)) - eps


def _bw_silverman(x) -> float:
    """Silverman's rule-of-thumb KDE bandwidth (stand-in for the reference's
    KDEpy ISJ estimator, unavailable offline)."""
    x = np.asarray(x, np.float64)
    iqr = np.subtract(*np.percentile(x, [75, 25]))
    sigma = min(x.std(), iqr / 1.34) or x.std() or 1.0
    return float(0.9 * sigma * len(x) ** (-0.2))


def robust_scale_binned(y, x, breaks):
    """Median/MAD z-scores within x-bins (parity: normalize.py:451)."""
    y, x = np.asarray(y, np.float64), np.asarray(x, np.float64)
    bins = np.digitize(x, breaks)
    res = np.zeros(bins.size)
    for b in np.unique(bins):
        m = bins == b
        yb = y[m]
        med = np.median(yb)
        res[m] = (yb - med) / (1.4826 * np.median(np.abs(yb - med))
                               + np.finfo(float).eps)
    return res


def is_outlier(y, x, th: float = 10):
    """Binned robust-z outlier flags over two shifted binnings
    (parity: normalize.py:462; Silverman bandwidth, see module docstring)."""
    x = np.asarray(x, np.float64)
    bin_width = (x.max() - x.min()) * _bw_silverman(x) / 2
    if bin_width <= 0:
        return np.zeros(len(x), bool)
    eps = np.finfo(float).eps * 10
    breaks1 = np.arange(x.min(), x.max() + bin_width, bin_width)
    breaks2 = np.arange(x.min() - eps - bin_width / 2, x.max() + bin_width,
                        bin_width)
    score1 = robust_scale_binned(y, x, breaks1)
    score2 = robust_scale_binned(y, x, breaks2)
    return np.abs(np.vstack([score1, score2])).min(0) > th


def theta_ml(y, mu, limit: int = 10):
    """ML estimate of the NB inverse-dispersion for one gene
    (parity: normalize.py:500; vectorized version inside
    :func:`_poisson_glm_theta` handles the whole matrix on device)."""
    y = jnp.asarray(y, jnp.float32)[:, None]
    mu = jnp.asarray(mu, jnp.float32)[:, None]
    return float(_theta_ml_vec(y, mu, limit=limit)[0])


def _kernel_reg_ll(y, xs, x_points, bw):
    """Local-linear Gaussian kernel regression (parity: the reference's
    statsmodels KernelReg(reg_type='ll'), normalize.py:415)."""
    d = (x_points[:, None] - xs[None, :]) / bw
    w = np.exp(-0.5 * d ** 2)
    dx = xs[None, :] - x_points[:, None]
    s0, s1, s2 = w.sum(1), (w * dx).sum(1), (w * dx ** 2).sum(1)
    t0, t1 = (w * y[None, :]).sum(1), (w * dx * y[None, :]).sum(1)
    denom = s0 * s2 - s1 ** 2
    pred = np.where(np.abs(denom) > 1e-12, (s2 * t0 - s1 * t1) / denom,
                    t0 / np.maximum(s0, 1e-12))
    return pred


from functools import partial as _partial


@_partial(jax.jit, static_argnames=("limit",))
def _theta_ml_vec(y, mu, limit: int = 10):
    """Vectorized theta_ml Newton iterations over genes (columns)."""
    from jax.scipy.special import digamma, polygamma
    n = y.shape[0]
    t0 = n / jnp.maximum(((y / jnp.maximum(mu, 1e-12) - 1) ** 2).sum(0), 1e-12)

    def score(th):
        return (digamma(th + y) - digamma(th) + jnp.log(th) + 1
                - jnp.log(th + mu) - (y + th) / (mu + th)).sum(0)

    def info(th):
        return (-polygamma(1, th + y) + polygamma(1, th) - 1 / th
                + 2 / (mu + th) - (y + th) / (mu + th) ** 2).sum(0)

    # unrolled Newton with the reference's loop semantics: at most limit-1
    # steps, per-gene early stop once |delta| <= eps**0.25 (normalize.py:518)
    eps = np.finfo(np.float64).eps ** 0.25
    t = t0
    de = jnp.ones_like(t0)
    for _ in range(limit - 1):
        active = jnp.abs(de) > eps
        t_abs = jnp.abs(t)
        step = score(t_abs[None, :]) / info(t_abs[None, :])
        de = jnp.where(active, step, 0.0)
        t = jnp.where(active, t_abs + step, t)
    return jnp.maximum(t, 0.0)


@jax.jit
def _poisson_glm_theta(y, u, n_irls: int = 25):
    """Per-gene Poisson GLM on [1, log_umi] + theta ML, all genes at once.

    ``y`` is (cells, genes), ``u`` the shared log10-umi covariate. Returns
    (beta (genes, 2), theta (genes,)). Replaces the reference's per-gene
    statsmodels fits in a process pool (normalize.py:475-497) with one
    vectorized IRLS program on the MXU.
    """
    eps = 1e-8
    b0 = jnp.log(jnp.maximum(y.mean(0), eps))
    b1 = jnp.zeros_like(b0)

    def irls(_, carry):
        b0, b1 = carry
        eta = b0[None, :] + u[:, None] * b1[None, :]
        mu = jnp.exp(jnp.clip(eta, -30, 30))
        z = eta + (y - mu) / jnp.maximum(mu, eps)
        w = mu
        s0 = w.sum(0)
        s1 = (w * u[:, None]).sum(0)
        s2 = (w * u[:, None] ** 2).sum(0)
        r0 = (w * z).sum(0)
        r1 = (w * z * u[:, None]).sum(0)
        # det >= 0 by Cauchy-Schwarz (weights are nonnegative)
        det = jnp.maximum(s0 * s2 - s1 ** 2, eps)
        nb0 = (s2 * r0 - s1 * r1) / det
        nb1 = (s0 * r1 - s1 * r0) / det
        return nb0, nb1

    b0, b1 = jax.lax.fori_loop(0, n_irls, irls, (b0, b1))
    mu = jnp.exp(jnp.clip(b0[None, :] + u[:, None] * b1[None, :], -30, 30))
    theta = _theta_ml_vec(y, mu)
    return jnp.stack([b0, b1], axis=1), theta


class ScTransformR(BaseTransform):
    """rpy2 bridge to the R scTransform (parity: normalize.py:109-204;
    unregistered in the reference too).

    Runs Seurat's ``SCTransform(vst.flavor="v2")`` in an embedded R session and
    writes the corrected ``RNA@data`` matrix back into ``data.data.X``. The
    reference protocol is mirrored step for step: CRAN mirror selection,
    BiocManager-driven install of Seurat/SingleCellExperiment, library-size
    logcounts, ``as.Seurat`` conversion, and the assay swap. Requires rpy2 + R
    at runtime (``try_import`` raises with an install hint when absent); the
    default JAX ``ScTransform`` (Pearson-residual GLM port) needs neither.
    """

    def __init__(self, min_cells: int = 5, mirror_index: int = -1, **kwargs):
        super().__init__(**kwargs)
        self.min_cells = min_cells
        self.mirror_index = mirror_index

    def _r_protocol(self) -> str:
        """The R side of the bridge (reference normalize.py:159-166), minus
        the anndata2ri dependency: the SCE is assembled in R from the raw
        counts matrix handed over as ``counts`` (genes x cells)."""
        return f"""
        sce <- SingleCellExperiment(assays=list(X=counts))
        libsizes <- colSums(counts)
        size.factors <- libsizes/mean(libsizes)
        logcounts(sce) <- log2(t(t(counts)/size.factors) + 1)
        seurat <- as.Seurat(sce, counts="X")
        seurat@assays$RNA <- seurat@assays$originalexp
        seurat_p = SCTransform(seurat, vst.flavor = "v2", verbose = FALSE,
                               min_cells={self.min_cells})
        """

    def _ensure_r_packages(self, robjects, rpackages):
        """Install-if-missing protocol (reference normalize.py:139-147)."""
        utils = rpackages.importr("utils")
        if self.mirror_index != -1:
            utils.chooseCRANmirror(ind=self.mirror_index)
        if not rpackages.isinstalled("BiocManager"):
            utils.install_packages("BiocManager")
        biocmanager = rpackages.importr("BiocManager")
        for pkg in ("Seurat", "SingleCellExperiment"):
            if not rpackages.isinstalled(pkg):
                biocmanager.install(pkg)
            robjects.r(f"library({pkg})")

    def __call__(self, data):
        import scipy.sparse as sp

        from dance_tpu.utils import try_import

        robjects = try_import("rpy2.robjects")
        rpackages = try_import("rpy2.robjects.packages")
        numpy2ri = try_import("rpy2.robjects.numpy2ri")
        conversion = try_import("rpy2.robjects.conversion")

        x = data.data.X
        if sp.issparse(x):
            self.logger.warning("Native support for sparse matrix is not "
                                "implemented yet, converting to dense array "
                                "explicitly.")
            x = x.toarray()
        x = np.asarray(x, np.float64)

        with conversion.localconverter(robjects.default_converter):
            self._ensure_r_packages(robjects, rpackages)
        with conversion.localconverter(robjects.default_converter
                                       + numpy2ri.converter):
            # R sees counts genes x cells (SCE/Seurat orientation)
            robjects.r.assign("counts", x.T)
            robjects.r(self._r_protocol())
            corrected = np.asarray(robjects.r("as.matrix(seurat@assays$RNA@data)"))
        data.data.X = corrected.T.astype(np.float32)
        return data


@register_preprocessor("normalize")
@add_mod_and_transform
class Log1P(AnnDataTransform):
    """log(1+x) (parity: normalize.py:529)."""

    def __init__(self, base: Optional[Number] = None, **kwargs):
        super().__init__("sc.pp.log1p", base=base, **kwargs)


@register_preprocessor("normalize")
@add_mod_and_transform
class NormalizeTotal(AnnDataTransform):
    """Per-cell total-count normalization (parity: normalize.py:567).

    ``max_fraction=1.0`` disables highly-expressed-gene exclusion."""

    def __init__(self, target_sum: Optional[float] = None, max_fraction: float = 0.05,
                 key_added: Optional[str] = None, **kwargs):
        exclude = max_fraction < 1.0
        super().__init__("sc.pp.normalize_total", target_sum=target_sum,
                         key_added=key_added, exclude_highly_expressed=exclude,
                         max_fraction=max_fraction, **kwargs)


@register_preprocessor("normalize")
@add_mod_and_transform
class NormalizePlaceHolder(BaseTransform):
    """No-op placeholder for pipeline search (parity: normalize.py:631)."""

    def __init__(self, **kwargs):
        super().__init__(**kwargs)

    def __call__(self, data):
        return data


@register_preprocessor("normalize")
@add_mod_and_transform
class UpdateSizeFactors(BaseTransform):
    """Store n_counts and median-normalized size factors in obs (parity: :644)."""

    def __init__(self, **kwargs):
        super().__init__(**kwargs)

    def __call__(self, data):
        adata = data.data
        counts = np.asarray(adata.X.sum(axis=1)).ravel()
        adata.obs["n_counts"] = counts
        adata.obs["size_factors"] = counts / np.median(counts)
        return data


@register_preprocessor("normalize")
@add_mod_and_transform
class NormalizeTotalLog1P(BaseTransform):
    """NormalizeTotal then Log1P (parity: normalize.py:662)."""

    _DISPLAY_ATTRS = ("base", "target_sum", "max_fraction")

    def __init__(self, base: Optional[Number] = None, target_sum: Optional[float] = None,
                 max_fraction: float = 0.05, **kwargs):
        super().__init__(**kwargs)
        self.base = base
        self.target_sum = target_sum
        self.max_fraction = max_fraction
        self._normalize = NormalizeTotal(target_sum=target_sum, max_fraction=max_fraction)
        self._log1p = Log1P(base=base)

    def __call__(self, data):
        self._normalize(data)
        self._log1p(data)
        return data

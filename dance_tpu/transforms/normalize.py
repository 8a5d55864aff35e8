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
    """Variance-stabilizing transform via NB Pearson residuals.

    Parity target: the Python ScTransform port (normalize.py:205). This
    implementation uses analytic Pearson residuals (Lause et al. 2021):
    mu_cg = (cell counts × gene fraction), residual (x-mu)/sqrt(mu+mu²/θ),
    clipped at sqrt(n) — the closed-form equivalent of scTransform's
    regularized NB regression, fully vectorized on device.
    """

    _DISPLAY_ATTRS = ("min_cells", "theta", "clip")

    def __init__(self, min_cells: int = 5, theta: float = 100.0,
                 clip: Optional[float] = None, **kwargs):
        super().__init__(**kwargs)
        self.min_cells = min_cells
        self.theta = theta
        self.clip = clip

    def __call__(self, data):
        adata = data.data
        X = adata.X
        dense = X.toarray() if sp.issparse(X) else np.asarray(X)
        keep = (dense > 0).sum(axis=0) >= self.min_cells
        if not keep.all():
            from dance_tpu.sc.pp import _subset_var
            _subset_var(adata, keep)
            dense = dense[:, keep]
        clip = self.clip if self.clip is not None else float(np.sqrt(dense.shape[0]))
        out = np.asarray(_pearson_residuals(jnp.asarray(dense, jnp.float32), self.theta,
                                            clip))
        adata.X = out
        return data


@jax.jit
def _pearson_residuals(x, theta, clip):
    cell_counts = x.sum(axis=1, keepdims=True)
    gene_frac = x.sum(axis=0, keepdims=True) / jnp.maximum(x.sum(), 1e-12)
    mu = cell_counts * gene_frac
    resid = (x - mu) / jnp.sqrt(mu + mu ** 2 / theta + 1e-12)
    return jnp.clip(resid, -clip, clip)


class ScTransformR(BaseTransform):
    """rpy2 bridge to the R scTransform (parity: normalize.py:109; unregistered).

    Retained for interop completeness; requires rpy2 + R at runtime."""

    def __init__(self, min_cells: int = 5, **kwargs):
        super().__init__(**kwargs)
        self.min_cells = min_cells

    def __call__(self, data):
        from dance_tpu.utils import try_import
        try_import("rpy2")  # raises with install hint when absent
        raise NotImplementedError(
            "R interop path not wired in this environment; use ScTransform (JAX) instead")


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

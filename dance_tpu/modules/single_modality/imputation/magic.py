"""MAGIC: Markov affinity-based graph imputation of cells, on device.

Parity target: dance/modules/single_modality/imputation/magic.py (adaptive
Gaussian kernel on kNN distances, symmetrized Markov matrix, t-step diffusion
of the expression matrix, optional rescaling). The diffusion P^t X is a chain
of dense matmuls on the MXU.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from dance_tpu.modules.base import BaseRegressionMethod
from dance_tpu.settings import logger
from dance_tpu.transforms import (AnnDataTransform, CellwiseMaskData, Compose,
                                  FilterCellsScanpy, FilterGenesScanpy, SaveRaw,
                                  SetConfig)
from dance_tpu.typing import LogLevel, Optional
from dance_tpu.utils.wrappers import as_numpy


def compute_markov(data, k: int = 10, epsilon: float = 1,
                   distance_metric: str = "euclidean", ka: int = 0):
    """Markov transition matrix from an adaptive-kernel kNN graph
    (parity: magic.py:84-137). Neighbor search runs on device
    (ops.neighbors.knn); the sparse assembly stays on the host.

    Returns a scipy CSR row-stochastic matrix ``T = D^-1 W`` where ``W`` is
    the symmetrized (optionally ka-autotuned) Gaussian affinity.
    """
    import scipy.sparse as sp

    from dance_tpu.ops.neighbors import knn

    if distance_metric != "euclidean":
        raise ValueError("only the reference's euclidean metric is supported")
    data = as_numpy(data).astype(np.float32)
    n = data.shape[0]
    k = min(k, n)
    dists, indices = knn(data, k, include_self=True)  # euclidean, sorted
    dists = as_numpy(dists)
    indices = as_numpy(indices)
    if ka > 0:
        # autotune: divide each row by its (ka+1)-th smallest distance
        srt = np.sort(dists, axis=1)
        denom = srt[:, min(ka, k - 1)]
        dists = np.where(denom[:, None] > 0, dists / np.maximum(
            denom[:, None], 1e-12), 0.0)
    rows = indices.ravel()
    cols = np.repeat(np.arange(n), k)
    vals = dists.ravel() if epsilon > 0 else np.ones(n * k)
    w = sp.csr_matrix((vals, (rows, cols)), shape=(n, n))
    w = w + w.T
    if epsilon > 0:
        r, c, d = sp.find(w)
        r = np.append(r, np.arange(n))
        c = np.append(c, np.arange(n))
        d = np.append(d / (epsilon ** 2), np.zeros(n))
        w = sp.csr_matrix((np.exp(-d), (r, c)), shape=(n, n))
    deg = np.ravel(w.sum(axis=1))
    dinv = np.where(deg != 0, 1.0 / np.maximum(deg, 1e-300), 0.0)
    return sp.diags(dinv) @ w


def impute_fast(data, L, t: int, rescale_percent: int = 0, L_t=None,
                tprev: int = None):
    """``data_new = L^t @ data`` with optional percentile rescaling
    (parity: magic.py:46-81). The matrix power runs as a dense matmul chain
    on the MXU. Returns ``(data_new, L_t)`` so callers can warm-start a
    larger ``t`` via ``L_t``/``tprev`` like the reference.
    """
    import scipy.sparse as sp

    data = as_numpy(data).astype(np.float32)
    L = np.asarray(L.todense() if sp.issparse(L) else L, np.float32)

    def mat_power(m, p):
        out = jnp.eye(m.shape[0], dtype=m.dtype)
        base = m
        while p:
            if p & 1:
                out = jnp.dot(out, base, precision=jax.lax.Precision.HIGHEST)
            base = jnp.dot(base, base, precision=jax.lax.Precision.HIGHEST)
            p >>= 1
        return out

    if L_t is None:
        L_t = mat_power(jnp.asarray(L), t)
    else:
        L_t = jnp.dot(jnp.asarray(L_t), mat_power(jnp.asarray(L), t - tprev),
                      precision=jax.lax.Precision.HIGHEST)
    data_new = np.asarray(jnp.dot(L_t, data,
                                  precision=jax.lax.Precision.HIGHEST))
    L_t = np.asarray(L_t)
    if rescale_percent != 0:
        if (data_new < 0).any():
            logger.warning("Rescaling should not be performed on "
                           "log-transformed (or other negative) values. "
                           "Imputed data returned unscaled.")
            return data_new, L_t
        m99 = np.percentile(data, rescale_percent, axis=0)
        m100 = data.max(axis=0)
        m99[m99 == 0] = m100[m99 == 0]
        m99n = np.percentile(data_new, rescale_percent, axis=0)
        m100n = data_new.max(axis=0)
        m99n[m99n == 0] = m100n[m99n == 0]
        data_new = data_new * (m99 / np.maximum(m99n, 1e-12))[None, :]
    return data_new, L_t


def magic(data, pca_projected_data, t: int = 6, k: int = 30, ka: int = 10,
          epsilon: float = 1, rescale: int = 99):
    """Functional MAGIC: Markov matrix from the PCA space, then t-step
    diffusion of ``data`` (parity: magic.py:22-43)."""
    L = compute_markov(pca_projected_data, k=k, epsilon=epsilon,
                       distance_metric="euclidean", ka=ka)
    new_data, _ = impute_fast(data, L, t, rescale_percent=rescale)
    return new_data


def optimal_t(data, th: float = 0.001, max_t: int = 32) -> int:
    """Smallest diffusion time where the retained spectral energy plateaus.

    The reference's optimal_t (magic.py:140-148) computes the per-t retained
    energy ``nse`` but falls off the end without returning; this version
    returns the first t where ``nse`` stops changing by more than ``th``
    (and fixes the reference's tuple-unpacking bug on np.linalg.svd).
    """
    data = as_numpy(data).astype(np.float32)
    s = np.linalg.svd(data, compute_uv=False) ** 2
    nse = np.zeros(max_t)
    for t in range(max_t):
        s_t = s ** t
        p = s_t / s_t.sum()
        nse[t] = p[p > th].sum()
        if t > 1 and abs(nse[t] - nse[t - 1]) < th:
            return t
    return max_t


class MAGIC(BaseRegressionMethod):
    """MAGIC model (parity: magic.py:151)."""

    _DISPLAY_ATTRS = ("t", "k", "ka", "epsilon", "rescale")

    def __init__(self, t: int = 3, k: int = 10, ka: int = 4, epsilon: float = 1.0,
                 rescale: int = 99, gpu: int = -1):
        self.t = t
        self.k = k
        self.ka = ka
        self.epsilon = epsilon
        self.rescale = rescale

    @staticmethod
    def preprocessing_pipeline(min_cells: float = 0.1, mask: bool = True,
                               distr: str = "exp", mask_rate: float = 0.1,
                               seed: Optional[int] = None,
                               log_level: LogLevel = "INFO"):
        transforms = [
            FilterGenesScanpy(min_cells=min_cells),
            FilterCellsScanpy(min_counts=1),
            SaveRaw(),
            AnnDataTransform("sc.pp.normalize_total", target_sum=1e4),
            AnnDataTransform("sc.pp.log1p"),
        ]
        if mask:
            transforms.append(CellwiseMaskData(distr=distr, mask_rate=mask_rate,
                                               seed=seed))
        transforms.append(SetConfig({
            "feature_channel": [None, "train_mask"] if mask else [None],
            "feature_channel_type": ["X", "layers"] if mask else ["X"],
            "label_channel": [None, None],
            "label_channel_type": ["X", "raw_X"]}))
        return Compose(*transforms, log_level=log_level)

    @partial(jax.jit, static_argnames=("self",))
    def _impute(self, x):
        # adaptive gaussian kernel from kNN distances
        d2 = ((x ** 2).sum(1)[:, None] + (x ** 2).sum(1)[None, :]
              - 2 * jnp.dot(x, x.T, precision=jax.lax.Precision.HIGHEST))
        d2 = jnp.maximum(d2, 0.0)
        n = x.shape[0]
        k = min(self.k, n - 1)
        ka = min(self.ka, k)
        neg_sorted = -jax.lax.top_k(-d2, k + 1)[0]  # ascending distances (incl self)
        sigma = jnp.sqrt(jnp.maximum(neg_sorted[:, ka], 1e-12)) * self.epsilon
        w = jnp.exp(-d2 / jnp.maximum(sigma[:, None] ** 2, 1e-12))
        # keep only kNN entries
        thresh = neg_sorted[:, k][:, None]
        w = jnp.where(d2 <= thresh, w, 0.0)
        w = (w + w.T) / 2
        p = w / jnp.maximum(w.sum(1, keepdims=True), 1e-12)
        out = x
        for _ in range(self.t):
            out = jnp.dot(p, out, precision=jax.lax.Precision.HIGHEST)
        if self.rescale:
            pct_orig = jnp.percentile(x, self.rescale, axis=0)
            pct_new = jnp.percentile(out, self.rescale, axis=0)
            scale = pct_orig / jnp.maximum(pct_new, 1e-12)
            out = out * jnp.where(x.max(0) > 0, scale, 1.0)[None, :]
        return out

    def fit(self, x, y=None, mask=None):
        x = as_numpy(x).astype(np.float32)
        if mask is not None:
            x = x * as_numpy(mask)
        self.imputed = np.asarray(self._impute(jnp.asarray(x)))
        return self

    def predict(self, x=None, mask=None):
        if x is not None and not hasattr(self, "imputed"):
            self.fit(x, mask=mask)
        return self.imputed

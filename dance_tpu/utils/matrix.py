"""Dense matrix utilities, JAX-jitted (parity: dance/utils/matrix.py).

The reference implements these with numpy + numba CPU loops; here the hot paths
are jitted jnp so they run on the VPU/MXU and fuse under XLA. Host numpy in,
host numpy out — callers at the model boundary use the jnp variants directly.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from dance_tpu.settings import logger
from dance_tpu.typing import NormMode


def normalize(mat, *, mode: NormMode = "normalize", axis: int = 0, eps: float = -1.0):
    """Normalize a 2-d matrix (parity: dance/utils/matrix.py:8).

    mode:
        - ``normalize``: divide by the axis sum.
        - ``standardize``: zero-mean, unit-std along axis.
        - ``minmax``: rescale to [0, 1] along axis.
        - ``l2``: divide by the axis L2 norm.
    eps:
        Clamp the divisor to at least ``eps`` (ignored when negative).
    """
    if sp.issparse(mat):
        mat = np.asarray(mat.todense())
    was_np = isinstance(mat, np.ndarray)
    out = _normalize_jit(jnp.asarray(mat, dtype=jnp.float32), mode, axis, eps)
    return np.asarray(out) if was_np else out


@partial(jax.jit, static_argnames=("mode", "axis"))
def _normalize_jit(mat, mode, axis, eps):
    if mode == "normalize":
        denom = mat.sum(axis=axis, keepdims=True)
    elif mode == "standardize":
        denom = mat.std(axis=axis, keepdims=True)
        mat = mat - mat.mean(axis=axis, keepdims=True)
    elif mode == "minmax":
        mn = mat.min(axis=axis, keepdims=True)
        mat = mat - mn
        denom = mat.max(axis=axis, keepdims=True)
    elif mode == "l2":
        denom = jnp.sqrt((mat ** 2).sum(axis=axis, keepdims=True))
    else:
        raise ValueError(f"Unknown normalization mode {mode!r}")
    denom = jnp.where(denom == 0, 1.0, denom)
    denom = jnp.where(eps > 0, jnp.maximum(denom, eps), denom)
    return mat / denom


def dist_to_rbf(dist, denom: float = 1.0):
    """Convert a distance matrix to an RBF affinity (parity: matrix.py:70)."""
    dist = jnp.asarray(dist, dtype=jnp.float32)
    sigma2 = jnp.maximum((dist ** 2).mean() * denom, 1e-12)
    return np.asarray(jnp.exp(-(dist ** 2) / sigma2))


@jax.jit
def _euclidean_pdist(x, y):
    # (a-b)^2 = a^2 + b^2 - 2ab on the MXU; full f32 precision — these distances
    # feed kNN graph construction where TPU default (bf16-accumulated) matmul
    # precision visibly perturbs neighbor ranking.
    xx = (x ** 2).sum(1)[:, None]
    yy = (y ** 2).sum(1)[None, :]
    xy = jnp.dot(x, y.T, precision=jax.lax.Precision.HIGHEST)
    return jnp.sqrt(jnp.maximum(xx + yy - 2 * xy, 0.0))


@jax.jit
def _pearson_pdist(x, y):
    xc = x - x.mean(1, keepdims=True)
    yc = y - y.mean(1, keepdims=True)
    xn = xc / jnp.maximum(jnp.linalg.norm(xc, axis=1, keepdims=True), 1e-12)
    yn = yc / jnp.maximum(jnp.linalg.norm(yc, axis=1, keepdims=True), 1e-12)
    return 1.0 - jnp.dot(xn, yn.T, precision=jax.lax.Precision.HIGHEST)


def _rankdata(x):
    # average-tie ranks along axis 1 (matches scipy.stats.rankdata "average");
    # rank = (#{< v} + #{<= v} + 1) / 2 via two searchsorted passes per row.
    # Ties matter: scRNA rows are zero-dominated, and arbitrary distinct ranks
    # on the zero block systematically bias Spearman distances.
    sx = jnp.sort(x, axis=1)

    def row_ranks(sorted_row, row):
        lo = jnp.searchsorted(sorted_row, row, side="left")
        hi = jnp.searchsorted(sorted_row, row, side="right")
        return (lo + hi + 1).astype(jnp.float32) / 2.0

    return jax.vmap(row_ranks)(sx, x)


@jax.jit
def _spearman_pdist(x, y):
    return _pearson_pdist(_rankdata(x), _rankdata(y))


_PDIST = {"euclidean": _euclidean_pdist, "pearson": _pearson_pdist, "spearman": _spearman_pdist,
          0: _euclidean_pdist, 1: _pearson_pdist, 2: _spearman_pdist}


def pairwise_distance(x, y=None, dist_func="euclidean"):
    """Pairwise distance matrix (parity: dance/utils/matrix.py:165).

    ``dist_func`` accepts names or the reference's integer codes
    (0=euclidean, 1=pearson, 2=spearman).
    """
    if dist_func not in _PDIST:
        raise ValueError(f"Unknown dist_func {dist_func!r}, options: euclidean|pearson|spearman")
    x = jnp.asarray(x, dtype=jnp.float32)
    y = x if y is None else jnp.asarray(y, dtype=jnp.float32)
    return np.asarray(_PDIST[dist_func](x, y))


# --------------------------------------------------------------------------
# Reference-named single-pair distances (parity: dance/utils/matrix.py:101-163;
# the reference numba-jits these — here they are plain numpy one-liners, with
# the batched jitted versions above doing the heavy lifting).
# --------------------------------------------------------------------------

def euclidean_distance(t1, t2) -> float:
    """Euclidean distance between two vectors (parity: matrix.py:101)."""
    return float(np.sqrt(np.sum((np.asarray(t1) - np.asarray(t2)) ** 2)))


def pearson_distance(a, b) -> float:
    """1 - Pearson correlation (parity: matrix.py:109)."""
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    ac, bc = a - a.mean(), b - b.mean()
    denom = np.sqrt((ac ** 2).sum() * (bc ** 2).sum())
    return float(1.0 - (ac @ bc) / max(denom, 1e-300))


def mean_rank_data(x) -> np.ndarray:
    """Average-tie ranks, 1-based (parity: matrix.py:121; scipy 'average')."""
    x = np.asarray(x)
    sx = np.sort(x)
    lo = np.searchsorted(sx, x, side="left")
    hi = np.searchsorted(sx, x, side="right")
    return (lo + hi + 1) / 2.0


def spearman_distance(x, y) -> float:
    """1 - Spearman rank correlation (parity: matrix.py:145)."""
    if len(x) != len(y):
        raise ValueError("x and y must have the same length")
    return pearson_distance(mean_rank_data(x), mean_rank_data(y))

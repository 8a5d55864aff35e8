"""Jitted linear algebra: randomized SVD / PCA (MXU-resident).

Replaces sklearn PCA/TruncatedSVD used throughout the reference transform
catalog (dance/transforms/cell_feature.py:17-290). Randomized range-finder
SVD (Halko et al.) maps to a handful of large matmuls — exactly the shape the
MXU wants — with QR re-orthogonalization between power iterations.
"""

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

HI = jax.lax.Precision.HIGHEST


@partial(jax.jit, static_argnames=("n_components", "n_oversample", "n_iter"))
def _rsvd(x, key, n_components: int, n_oversample: int = 10, n_iter: int = 4):
    m, n = x.shape
    k = min(n_components + n_oversample, min(m, n))
    omega = jax.random.normal(key, (n, k), dtype=x.dtype)
    y = jnp.dot(x, omega, precision=HI)
    q, _ = jnp.linalg.qr(y)
    for _ in range(n_iter):  # power iterations sharpen the spectrum
        z = jnp.dot(x.T, q, precision=HI)
        q, _ = jnp.linalg.qr(z)
        y = jnp.dot(x, q, precision=HI)
        q, _ = jnp.linalg.qr(y)
    b = jnp.dot(q.T, x, precision=HI)
    ub, s, vt = jnp.linalg.svd(b, full_matrices=False)
    u = jnp.dot(q, ub, precision=HI)
    return u[:, :n_components], s[:n_components], vt[:n_components]


def _sign_flip(u, vt):
    # deterministic sign convention: largest-|v| entry positive per component,
    # matching sklearn's svd_flip(u_based_decision=False) used by PCA
    max_idx = jnp.argmax(jnp.abs(vt), axis=1)
    signs = jnp.sign(vt[jnp.arange(vt.shape[0]), max_idx])
    return u * signs[None, :], vt * signs[:, None]


def randomized_svd(x, n_components: int, *, n_iter: int = 4, seed: int = 0,
                   sign_convention: bool = True, solver: str = "auto"):
    """Truncated SVD of ``x`` (dense or CSRMatrix, densified) -> (U, S, Vt).

    solver='auto' uses exact jnp SVD when min(m, n) <= 1024 (randomized range
    finding cannot separate near-degenerate singular values, and below ~1k the
    exact SVD is cheap on device); 'randomized' / 'exact' force a choice.
    """
    from dance_tpu.ops.sparse import CSRMatrix
    if isinstance(x, CSRMatrix):
        # sparse-native randomized path: never densifies the matrix — range
        # finding runs as CSR SpMM / SpMM^T (gather + segment-sum on device)
        u, s, vt = _rsvd_sparse(x, jax.random.key(seed), n_components, n_iter=n_iter)
        if sign_convention:
            u, vt = _sign_flip(u, vt)
        return u, s, vt
    x = jnp.asarray(x, dtype=jnp.float32)
    if solver == "auto":
        solver = "exact" if min(x.shape) <= 1024 else "randomized"
    if solver == "exact":
        u, s, vt = _exact_svd(x)
        u, s, vt = u[:, :n_components], s[:n_components], vt[:n_components]
    else:
        u, s, vt = _rsvd(x, jax.random.key(seed), n_components, n_iter=n_iter)
    if sign_convention:
        u, vt = _sign_flip(u, vt)
    return u, s, vt


@partial(jax.jit, static_argnames=("n_components", "n_oversample", "n_iter"))
def _rsvd_sparse(x, key, n_components: int, n_oversample: int = 10, n_iter: int = 4):
    from dance_tpu.ops.sparse import csr_matmat, csr_rmatmat
    m, n = x.shape
    k = min(n_components + n_oversample, min(m, n))
    omega = jax.random.normal(key, (n, k), dtype=jnp.float32)
    q, _ = jnp.linalg.qr(csr_matmat(x, omega))
    for _ in range(n_iter):
        z, _ = jnp.linalg.qr(csr_rmatmat(x, q))
        q, _ = jnp.linalg.qr(csr_matmat(x, z))
    b = csr_rmatmat(x, q).T  # (k, n) = q^T A
    ub, s, vt = jnp.linalg.svd(b, full_matrices=False)
    u = jnp.dot(q, ub, precision=HI)
    return u[:, :n_components], s[:n_components], vt[:n_components]


@jax.jit
def _exact_svd(x):
    return jnp.linalg.svd(x, full_matrices=False)


class PCAResult(NamedTuple):
    embedding: jax.Array          # (n, k) transformed data
    components: jax.Array         # (k, d) principal axes
    mean: jax.Array               # (d,)
    explained_variance: jax.Array  # (k,)


def pca(x, n_components: int, *, n_iter: int = 4, seed: int = 0) -> PCAResult:
    """PCA via randomized SVD of the centered matrix (sklearn-parity signs)."""
    x = jnp.asarray(x, dtype=jnp.float32)
    mean = x.mean(axis=0)
    xc = x - mean[None, :]
    u, s, vt = randomized_svd(xc, n_components, n_iter=n_iter, seed=seed)
    emb = u * s[None, :]
    ev = (s ** 2) / (x.shape[0] - 1)
    return PCAResult(emb, vt, mean, ev)


def pca_transform(x, result: PCAResult) -> jax.Array:
    return jnp.dot(jnp.asarray(x, jnp.float32) - result.mean[None, :], result.components.T,
                   precision=HI)


def svd_embedding(x, n_components: int, **kwargs):
    """TruncatedSVD-style embedding (no centering): U * S and components."""
    u, s, vt = randomized_svd(x, n_components, **kwargs)
    return u * s[None, :], vt


def gram_schmidt_gauss_proj(key, n_features: int, n_components: int, dtype=jnp.float32):
    """Random Gaussian projection matrix (GaussRandProjFeature backend)."""
    return jax.random.normal(key, (n_features, n_components), dtype) / jnp.sqrt(n_components)


__all__ = ["PCAResult", "pca", "pca_transform", "randomized_svd", "svd_embedding",
           "gram_schmidt_gauss_proj"]

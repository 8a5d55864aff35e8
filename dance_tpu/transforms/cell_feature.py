"""Cell feature-reduction transforms (parity: dance/transforms/cell_feature.py).

The sklearn PCA/TruncatedSVD/SparsePCA/GaussianRandomProjection backends of the
reference become jitted device linalg from :mod:`dance_tpu.ops.linalg`.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dance_tpu.ops.linalg import pca as jax_pca, randomized_svd, svd_embedding
from dance_tpu.registry import register_preprocessor
from dance_tpu.transforms.base import BaseTransform
from dance_tpu.typing import Literal, Optional, Union
from dance_tpu.utils.matrix import normalize
from dance_tpu.utils.wrappers import add_mod_and_transform


def _resolve_k(n_components, shape, logger):
    k = n_components
    if k > min(shape):
        logger.warning("n_components=%s > min(n_samples, n_features)=%s; clipping",
                       k, min(shape))
        k = min(shape)
    return int(k)


@register_preprocessor("feature", "cell")
@add_mod_and_transform
class WeightedFeaturePCA(BaseTransform):
    """Gene-PCA then expression-weighted cell embedding (parity: cell_feature.py:17).

    PCA is computed over genes (on the chosen split); each cell's feature is the
    row-normalized-expression-weighted sum of gene PCs. Stores both the cell
    embedding (obsm) and the gene embedding (varm) — the bipartite graph
    builders consume both.
    """

    _DISPLAY_ATTRS = ("n_components", "split_name", "feat_norm_mode", "feat_norm_axis")

    def __init__(self, n_components: Union[float, int] = 400,
                 split_name: Optional[str] = None, feat_norm_mode: Optional[str] = None,
                 feat_norm_axis: int = 0, save_info: bool = False, **kwargs):
        super().__init__(**kwargs)
        self.n_components = n_components
        self.split_name = split_name
        self.feat_norm_mode = feat_norm_mode
        self.feat_norm_axis = feat_norm_axis
        self.save_info = save_info

    def __call__(self, data):
        feat = np.asarray(data.get_x(self.split_name), dtype=np.float32)
        if self.feat_norm_mode is not None:
            feat = normalize(feat, mode=self.feat_norm_mode, axis=self.feat_norm_axis)
        k = _resolve_k(self.n_components, feat.shape, self.logger)
        res = jax_pca(feat.T, k)  # genes x components
        gene_feat = np.asarray(res.embedding, dtype=np.float32)
        self.logger.info("Decomposed %s features %s (k=%d)", self.split_name, feat.shape, k)
        x = np.asarray(data.get_x(), dtype=np.float32)
        cell_feat = normalize(x, mode="normalize", axis=1) @ gene_feat
        data.data.obsm[self.out] = cell_feat.astype(np.float32)
        data.data.varm[self.out] = gene_feat
        if self.save_info:
            data.data.uns["pca_components"] = np.asarray(res.components)
            data.data.uns["pca_mean"] = np.asarray(res.mean)
            data.data.uns["pca_explained_variance"] = np.asarray(res.explained_variance)
        return data


@register_preprocessor("feature", "cell")
@add_mod_and_transform
class WeightedFeatureSVD(BaseTransform):
    """Gene-SVD then expression-weighted cell embedding (parity: cell_feature.py:78).

    Float ``n_components`` selects the smallest k reaching that explained-
    variance ratio."""

    _DISPLAY_ATTRS = ("n_components", "split_name", "feat_norm_mode", "feat_norm_axis")

    def __init__(self, n_components: Union[float, int] = 400,
                 split_name: Optional[str] = None, feat_norm_mode: Optional[str] = None,
                 feat_norm_axis: int = 0, save_info: bool = False, **kwargs):
        super().__init__(**kwargs)
        self.n_components = n_components
        self.split_name = split_name
        self.feat_norm_mode = feat_norm_mode
        self.feat_norm_axis = feat_norm_axis
        self.save_info = save_info

    def __call__(self, data):
        feat = np.asarray(data.get_x(self.split_name), dtype=np.float32)
        if isinstance(self.n_components, float):
            self.n_components = _evr_components(feat, self.n_components)
        if self.feat_norm_mode is not None:
            feat = normalize(feat, mode=self.feat_norm_mode, axis=self.feat_norm_axis)
        k = _resolve_k(self.n_components, feat.shape, self.logger)
        gene_feat, comps = svd_embedding(feat.T, k)
        gene_feat = np.asarray(gene_feat, dtype=np.float32)
        x = np.asarray(data.get_x(), dtype=np.float32)
        cell_feat = normalize(x, mode="normalize", axis=1) @ gene_feat
        data.data.obsm[self.out] = cell_feat.astype(np.float32)
        data.data.varm[self.out] = gene_feat
        if self.save_info:
            data.data.uns["svd_components"] = np.asarray(comps)
        return data


def _evr_components(feat, target_ratio: float) -> int:
    """Smallest k whose cumulative explained-variance ratio exceeds target."""
    kmax = min(feat.shape) - 1
    _, s, _ = randomized_svd(feat, kmax)
    ev = np.asarray(s) ** 2
    evr = np.cumsum(ev) / ev.sum()
    return int((evr < target_ratio).sum() + 1)


@register_preprocessor("feature", "cell")
@add_mod_and_transform
class CellPCA(BaseTransform):
    """PCA cell embedding into obsm (parity: cell_feature.py:144)."""

    _DISPLAY_ATTRS = ("n_components",)

    def __init__(self, n_components: Union[float, int] = 400, *,
                 channel: Optional[str] = None, mod: Optional[str] = None,
                 save_info: bool = False,
                 svd_solver: Literal["auto", "full", "arpack", "randomized"] = "auto",
                 **kwargs):
        super().__init__(**kwargs)
        self.n_components = n_components
        self.channel = channel
        self.save_info = save_info
        self.svd_solver = svd_solver

    def __call__(self, data):
        feat = np.asarray(data.get_feature(return_type="numpy", channel=self.channel),
                          dtype=np.float32)
        k = _resolve_k(self.n_components, feat.shape, self.logger)
        res = jax_pca(feat, k)
        self.logger.info("Generating cell PCA features %s (k=%d)", feat.shape, k)
        data.data.obsm[self.out] = np.asarray(res.embedding)
        if self.save_info:
            data.data.uns["pca_components"] = np.asarray(res.components)
            data.data.uns["pca_mean"] = np.asarray(res.mean)
            data.data.uns["pca_explained_variance"] = np.asarray(res.explained_variance)
        return data


@register_preprocessor("feature", "cell")
@add_mod_and_transform
class CellSparsePCA(BaseTransform):
    """Sparse-loading PCA cell embedding (parity: cell_feature.py:197).

    Sparse loadings via iterative soft-thresholded power iterations (SPCA by
    regularized SVD), on device."""

    _DISPLAY_ATTRS = ("n_components", "alpha")

    def __init__(self, n_components: Union[float, int] = 400, *,
                 channel: Optional[str] = None, mod: Optional[str] = None,
                 alpha: float = 1.0, **kwargs):
        super().__init__(**kwargs)
        self.n_components = n_components
        self.channel = channel
        self.alpha = alpha

    def __call__(self, data):
        feat = np.asarray(data.get_feature(return_type="numpy", channel=self.channel),
                          dtype=np.float32)
        k = _resolve_k(self.n_components, feat.shape, self.logger)
        xc = jnp.asarray(feat) - jnp.asarray(feat).mean(0)
        comps = _sparse_pca(xc, k, self.alpha)
        data.data.obsm[self.out] = np.asarray(xc @ comps.T)
        data.data.varm["sparse_components"] = np.asarray(comps).T
        return data


def _sparse_pca(xc, k: int, alpha: float, n_iter: int = 30):
    """Soft-thresholded deflation power iterations -> (k, d) sparse loadings."""
    u, s, vt = randomized_svd(xc, k)
    v = jnp.asarray(vt)
    x = jnp.asarray(xc)
    for _ in range(n_iter):
        u_new = x @ v.T
        u_new = u_new / jnp.maximum(jnp.linalg.norm(u_new, axis=0, keepdims=True), 1e-12)
        v_new = u_new.T @ x
        v_new = jnp.sign(v_new) * jnp.maximum(jnp.abs(v_new) - alpha, 0.0)
        norms = jnp.maximum(jnp.linalg.norm(v_new, axis=1, keepdims=True), 1e-12)
        v = v_new / norms
    return v


@register_preprocessor("feature", "cell")
@add_mod_and_transform
class CellSVD(BaseTransform):
    """Truncated-SVD cell embedding (parity: cell_feature.py:236)."""

    _DISPLAY_ATTRS = ("n_components",)

    def __init__(self, n_components: Union[float, int] = 400, *,
                 channel: Optional[str] = None, mod: Optional[str] = None,
                 algorithm: Literal["arpack", "randomized"] = "randomized",
                 save_info: bool = True, **kwargs):
        super().__init__(**kwargs)
        self.n_components = n_components
        self.channel = channel
        self.save_info = save_info
        self.algorithm = algorithm

    def __call__(self, data):
        feat = np.asarray(data.get_feature(return_type="numpy", channel=self.channel),
                          dtype=np.float32)
        if isinstance(self.n_components, float):
            self.n_components = _evr_components(feat, self.n_components)
        k = _resolve_k(self.n_components, feat.shape, self.logger)
        emb, comps = svd_embedding(feat, k)
        self.logger.info("Generating cell SVD features %s (k=%d)", feat.shape, k)
        data.data.obsm[self.out] = np.asarray(emb)
        if self.save_info:
            data.data.uns["svd_components"] = np.asarray(comps)
        return data


@register_preprocessor("feature", "cell")
@add_mod_and_transform
class FeatureCellPlaceHolder(BaseTransform):
    """No-op placeholder: passes X through as obsm/varm (parity: cell_feature.py:291)."""

    def __init__(self, n_components: int = 400, *, channel: Optional[str] = None,
                 mod: Optional[str] = None, **kwargs):
        super().__init__(**kwargs)
        self.channel = channel

    def __call__(self, data):
        feat = np.asarray(data.get_feature(return_type="numpy", channel=self.channel))
        data.data.obsm[self.out] = feat
        data.data.varm[self.out] = feat.T
        return data


@register_preprocessor("feature", "cell")
class BatchFeature(BaseTransform):
    """Per-cell statistical features grouped by batch (parity: cell_feature.py:321).

    Computes 9 nonzero-statistics per cell, averages them per batch, and assigns
    each cell its batch's feature vector (``mod1.obsm['batch_features']``)."""

    def __init__(self, *, channel: Optional[str] = None, mod: Optional[str] = "mod1",
                 **kwargs):
        super().__init__(**kwargs)
        self.channel = channel
        self.mod = mod

    def __call__(self, data):
        import scipy.sparse as sp
        adata = data.data.mod[self.mod] if hasattr(data.data, "mod") else data.data
        X = adata.X.toarray() if sp.issparse(adata.X) else np.asarray(adata.X)
        batches = np.asarray(adata.obs["batch"])
        nz_mask = X != 0
        if not nz_mask.any(axis=1).all():
            raise ValueError("One or more cells contain all-zero features")
        stats = np.zeros((X.shape[0], 9), dtype=np.float64)
        stats[:, 0] = X.mean(1)
        stats[:, 1] = X.std(1)
        Xm = np.where(nz_mask, X, np.nan)
        stats[:, 2] = np.nanpercentile(Xm, 25, axis=1)
        stats[:, 3] = np.nanpercentile(Xm, 50, axis=1)
        stats[:, 4] = np.nanpercentile(Xm, 75, axis=1)
        stats[:, 5] = X.max(1)
        stats[:, 6] = nz_mask.sum(1) / 1000
        stats[:, 7] = np.nanmean(Xm, axis=1)
        stats[:, 8] = np.nanstd(Xm, axis=1)
        df = np.zeros_like(stats)
        for b in np.unique(batches):
            m = batches == b
            df[m] = stats[m].mean(axis=0)
        adata.obsm["batch_features"] = df.astype(np.float32)
        return data


@register_preprocessor("feature", "cell")
@add_mod_and_transform
class GaussRandProjFeature(BaseTransform):
    """Gaussian random projection cell features (parity: cell_feature.py:381)."""

    _DISPLAY_ATTRS = ("n_components", "eps")

    def __init__(self, n_components: int = 400, eps: float = 0.1, seed: int = 0, **kwargs):
        super().__init__(**kwargs)
        self.n_components = n_components
        self.eps = eps
        self.seed = seed

    def __call__(self, data):
        feat = jnp.asarray(np.asarray(data.get_feature(return_type="numpy"), np.float32))
        key = jax.random.key(self.seed)
        proj = jax.random.normal(key, (feat.shape[1], self.n_components),
                                 jnp.float32) / jnp.sqrt(self.n_components)
        self.logger.info("Gaussian random projection to d=%d", self.n_components)
        data.data.obsm[self.out] = np.asarray(feat @ proj)
        return data

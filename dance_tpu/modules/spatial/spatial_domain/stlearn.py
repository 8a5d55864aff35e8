"""stLearn spatial clustering heads (parity: dance/modules/spatial/
spatial_domain/stlearn.py:21,:107).

KMeans / Louvain over the SME-normalized features (SMEGraph + SMEFeature).
"""

import numpy as np

from dance_tpu.modules.base import BaseClusteringMethod
from dance_tpu.transforms import (AnnDataTransform, CellPCA, Compose, MorphologyFeatureCNN,
                                  SMEFeature, SetConfig)
from dance_tpu.transforms.graph import SMEGraph
from dance_tpu.typing import LogLevel, Optional


def _sme_pipeline(n_components: int = 50, log_level: LogLevel = "INFO"):
    return Compose(
        AnnDataTransform("sc.pp.filter_genes", min_cells=1),
        AnnDataTransform("sc.pp.normalize_total", target_sum=1e4),
        AnnDataTransform("sc.pp.log1p"),
        AnnDataTransform("sc.pp.scale"),
        CellPCA(n_components=n_components),
        MorphologyFeatureCNN(n_components=n_components),
        SMEGraph(),
        SMEFeature(n_components=n_components),
        SetConfig({"feature_channel": "SMEFeature", "feature_channel_type": "obsm",
                   "label_channel": "label", "label_channel_type": "obs"}),
        log_level=log_level,
    )


class StKmeans(BaseClusteringMethod):
    """KMeans over SME features (parity: stlearn.py:21)."""

    _DISPLAY_ATTRS = ("n_clusters",)

    def __init__(self, n_clusters: int = 19, init: str = "k-means++", n_init: int = 10,
                 max_iter: int = 300, tol: float = 1e-4, algorithm: str = "auto",
                 verbose: bool = False, random_state: int = 0, use_data: str = "X_pca",
                 key_added: str = "X_pca_kmeans", device: str = "auto"):
        self.n_clusters = n_clusters
        self.n_init = n_init
        self.max_iter = max_iter
        self.tol = tol
        self.random_state = random_state

    preprocessing_pipeline = staticmethod(_sme_pipeline)

    def fit(self, x, y=None):
        import jax.numpy as jnp

        from dance_tpu.ops.cluster import kmeans
        from dance_tpu.utils.wrappers import as_device
        self.pred = np.asarray(kmeans(as_device(x, jnp.float32), self.n_clusters,
                                      n_init=self.n_init, n_iter=self.max_iter,
                                      seed=self.random_state, tol=self.tol).labels)
        return self

    def predict(self, x=None):
        return self.pred


class StLouvain(BaseClusteringMethod):
    """Louvain over the SME-feature kNN graph (parity: stlearn.py:107)."""

    _DISPLAY_ATTRS = ("resolution",)

    def __init__(self, resolution: float = 1.0, n_neighbors: int = 15, seed: int = 0):
        self.resolution = resolution
        self.n_neighbors = n_neighbors
        self.seed = seed

    preprocessing_pipeline = staticmethod(_sme_pipeline)

    def fit(self, x, y=None, *, adj=None):
        from dance_tpu.ops.cluster import louvain
        from dance_tpu.ops.neighbors import knn_graph
        if adj is None:
            adj = knn_graph(np.asarray(x, np.float32),
                            min(self.n_neighbors, len(x) - 1), mode="connectivity",
                            include_self=False)
        self.pred = louvain(adj, resolution=self.resolution, seed=self.seed)
        return self

    def predict(self, x=None):
        return self.pred

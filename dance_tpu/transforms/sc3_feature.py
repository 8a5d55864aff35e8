"""SC3 consensus-clustering similarity feature (parity: dance/transforms/sc3_feature.py).

Vectorized rebuild of the reference's nested-loop implementation: three
distance kernels (euclidean/pearson/spearman) -> PCA + normalized-Laplacian
projections -> KMeans over prefix dimensions -> averaged co-cluster binary
similarity matrix.
"""

import math

import numpy as np

from dance_tpu.transforms.base import BaseTransform
from dance_tpu.typing import Optional
from dance_tpu.utils.matrix import pairwise_distance
from dance_tpu.utils.status import experimental


def normalized_laplacian(adj: np.ndarray) -> np.ndarray:
    r = adj.sum(axis=1)
    r_sqrt = 1.0 / np.sqrt(np.maximum(r, 1e-12))
    return np.eye(adj.shape[0]) - (r_sqrt[:, None] * adj) * r_sqrt[None, :]


@experimental(msg="out channel type under review (cell-cell similarity in uns)")
class SC3Feature(BaseTransform):
    """Cluster-based similarity partitioning (parity: sc3_feature.py:25)."""

    _DISPLAY_ATTRS = ("n_cluster", "d")

    def __init__(self, n_cluster: int = 3, d: Optional[int] = None, seed: int = 9,
                 **kwargs):
        super().__init__(**kwargs)
        self.n_cluster = n_cluster
        self.d = d
        self.seed = seed

    def __call__(self, data):
        from dance_tpu.ops.cluster import kmeans
        from dance_tpu.ops.linalg import pca

        feat = np.asarray(data.get_feature(return_type="numpy"), dtype=np.float32)
        n = feat.shape[0]
        d = self.d
        if d is None:
            d = math.ceil(n * 0.07) - math.floor(n * 0.04)
        if d > 15:
            rng = np.random.default_rng(self.seed)
            choices = sorted(rng.choice(range(d), 15, replace=False))
        else:
            choices = list(range(max(d, 1)))

        mats = []
        for dist in ("euclidean", "pearson", "spearman"):
            dm = pairwise_distance(feat, dist_func=dist)
            k = min(n, len(choices) and max(choices) + 1 or 1)
            emb = np.asarray(pca(dm, min(n - 1, max(choices) + 1)).embedding)
            mats.append(emb[:, [c for c in choices if c < emb.shape[1]]])
            lap = normalized_laplacian(dm)
            mats.append(lap[:, [c for c in choices if c < lap.shape[1]]])

        sims = []
        for mat in mats:
            for i in range(mat.shape[1]):
                labels = np.asarray(kmeans(mat[:, :i + 1], self.n_cluster, n_init=1,
                                           seed=self.seed).labels)
                sims.append((labels[:, None] == labels[None, :]).astype(np.float64))
        data.data.uns[self.out] = np.mean(sims, axis=0)
        return data

"""Spatial graphs (parity: dance/transforms/graph/spatial_graph.py)."""

import numpy as np
import scipy.sparse as sp

from dance_tpu.registry import register_preprocessor
from dance_tpu.transforms.base import BaseTransform
from dance_tpu.typing import Sequence
from dance_tpu.utils.matrix import pairwise_distance


@register_preprocessor("graph", "spatial")
class SpaGCNGraph(BaseTransform):
    """Histology-aware 3-d spot distance matrix (parity: spatial_graph.py:13).

    z-channel is the variance-weighted mean color of the beta-neighborhood of
    each spot in the H&E image, scaled by ``alpha``."""

    _DISPLAY_ATTRS = ("alpha", "beta")

    def __init__(self, alpha, beta, *,
                 channels: Sequence[str] = ("spatial", "spatial_pixel", "image"),
                 channel_types: Sequence[str] = ("obsm", "obsm", "uns"), **kwargs):
        super().__init__(**kwargs)
        self.alpha = alpha
        self.beta = beta
        self.channels = channels
        self.channel_types = channel_types

    def __call__(self, data):
        xy = data.get_feature(return_type="numpy", channel=self.channels[0],
                              channel_type=self.channel_types[0])
        xy_pixel = np.asarray(data.get_feature(return_type="numpy",
                                               channel=self.channels[1],
                                               channel_type=self.channel_types[1]),
                              dtype=int)
        img = data.get_feature(return_type="default", channel=self.channels[2],
                               channel_type=self.channel_types[2])
        img = np.asarray(img)
        self.logger.info("Computing histology-aware adjacency")
        g = np.zeros((xy.shape[0], 3))
        half = round(self.beta / 2)
        x_lim, y_lim = img.shape[:2]
        for i, (xp, yp) in enumerate(xy_pixel):
            view = img[max(0, xp - half):min(x_lim, xp + half + 1),
                       max(0, yp - half):min(y_lim, yp + half + 1)]
            g[i] = view.mean(axis=(0, 1))
        g_var = g.var(0)
        z = (g * g_var).sum(1, keepdims=True) / max(g_var.sum(), 1e-12)
        z = (z - z.mean()) / max(z.std(), 1e-12)
        z *= xy.std(0).max() * self.alpha
        xyz = np.hstack((xy, z)).astype(np.float32)
        data.data.obsp[self.out] = pairwise_distance(xyz, dist_func="euclidean")
        return data


@register_preprocessor("graph", "spatial")
class SpaGCNGraph2D(BaseTransform):
    """Plain 2-d pixel distance matrix (parity: spatial_graph.py:66)."""

    def __init__(self, *, channel: str = "spatial_pixel", **kwargs):
        super().__init__(**kwargs)
        self.channel = channel

    def __call__(self, data):
        x = data.get_feature(channel=self.channel, channel_type="obsm",
                             return_type="numpy")
        data.data.obsp[self.out] = pairwise_distance(np.asarray(x, np.float32),
                                                     dist_func="euclidean")
        return data


@register_preprocessor("graph", "spatial")
class SMEGraph(BaseTransform):
    """Spatial-Morphological-Expression composite graph (parity: spatial_graph.py:80)."""

    def __init__(self, radius: float = 3, *,
                 channels: Sequence[str] = ("spatial", "spatial_pixel",
                                            "MorphologyFeatureCNN", "CellPCA"),
                 channel_types: Sequence[str] = ("obsm", "obsm", "obsm", "obsm"),
                 **kwargs):
        super().__init__(**kwargs)
        self.radius = radius
        self.channels = channels
        self.channel_types = channel_types

    def __call__(self, data):
        get = lambda i: np.asarray(data.get_feature(
            return_type="numpy", channel=self.channels[i],
            channel_type=self.channel_types[i]), dtype=np.float64)
        xy, xy_pixel, morph, gene = get(0), get(1), get(2), get(3)

        # pixel-per-coordinate unit via 1-d least squares on each axis
        def slope(a, b):
            a = a - a.mean()
            b = b - b.mean()
            return (a * b).sum() / max((a * a).sum(), 1e-12)

        unit = np.sqrt(slope(xy[:, 0], xy_pixel[:, 0]) ** 2
                       + slope(xy[:, 1], xy_pixel[:, 1]) ** 2)
        pdist = pairwise_distance(xy_pixel.astype(np.float32), dist_func="euclidean")
        adj_p = (pdist < self.radius * unit).astype(np.float64)
        adj_m = np.clip(1 - _cosine_distances(morph), 0, None)
        adj_g = 1 - _correlation_distances(gene)
        data.data.obsp[self.out] = adj_p * adj_m * adj_g
        return data


def _cosine_distances(x):
    xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    return 1 - xn @ xn.T


def _correlation_distances(x):
    xc = x - x.mean(1, keepdims=True)
    return _cosine_distances(xc)


@register_preprocessor("graph", "spatial")
class StagateGraph(BaseTransform):
    """Radius/kNN spatial connectivity (parity: spatial_graph.py:113)."""

    _MODELS = ("radius", "knn")
    _DISPLAY_ATTRS = ("model_name", "radius", "n_neighbors")

    def __init__(self, model_name: str = "radius", *, radius: float = 1,
                 n_neighbors: int = 5, channel: str = "spatial_pixel",
                 channel_type: str = "obsm", **kwargs):
        super().__init__(**kwargs)
        if not isinstance(model_name, str) or model_name.lower() not in self._MODELS:
            raise ValueError(f"Unknown model {model_name!r}, options: {self._MODELS}")
        self.model_name = model_name.lower()
        self.radius = radius
        self.n_neighbors = n_neighbors
        self.channel = channel
        self.channel_type = channel_type

    def __call__(self, data):
        from dance_tpu.ops.neighbors import knn_graph, radius_graph
        xy = np.asarray(data.get_feature(return_type="numpy", channel=self.channel,
                                         channel_type=self.channel_type), np.float32)
        if self.model_name == "radius":
            adj = radius_graph(xy, self.radius)
        else:
            adj = knn_graph(xy, self.n_neighbors, mode="connectivity",
                            include_self=True, symmetrize=False)
        data.data.obsp[self.out] = sp.csr_matrix(adj)
        return data

"""kNN neighbor graph transform (parity: dance/transforms/graph/neighbor_graph.py)."""

from dance_tpu.registry import register_preprocessor
from dance_tpu.transforms.base import BaseTransform
from dance_tpu.typing import Optional


@register_preprocessor("graph", "cell")
class NeighborGraph(BaseTransform):
    """Connectivity adjacency from exact device kNN (replaces scanpy.pp.neighbors)."""

    _DISPLAY_ATTRS = ("n_neighbors", "n_pcs", "knn", "random_state", "method", "metric")

    def __init__(self, n_neighbors: int = 15, *, n_pcs: Optional[int] = None,
                 knn: bool = True, random_state: int = 0,
                 method: Optional[str] = "umap", metric: str = "euclidean",
                 channel: Optional[str] = "CellPCA", **kwargs):
        super().__init__(**kwargs)
        self.n_neighbors = n_neighbors
        self.n_pcs = n_pcs
        self.knn = knn
        self.random_state = random_state
        self.method = method
        self.metric = metric
        self.channel = channel

    def __call__(self, data):
        import numpy as np

        from dance_tpu.ops.neighbors import knn_graph
        self.logger.info("Computing kNN connectivity adjacency matrix")
        rep = np.asarray(data.get_feature(return_type="numpy", channel=self.channel),
                         dtype=np.float32)
        if self.n_pcs is not None:
            rep = rep[:, :self.n_pcs]
        adj = knn_graph(rep, self.n_neighbors, mode="gauss", include_self=False,
                        symmetrize=True)
        data.data.obsp[self.out] = adj
        return data

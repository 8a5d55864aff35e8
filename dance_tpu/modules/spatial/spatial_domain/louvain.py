"""Louvain spatial-domain identification (parity: dance/modules/spatial/
spatial_domain/louvain.py:328).

The reference vendors python-louvain; here the first-party Louvain from
:mod:`dance_tpu.ops.cluster` runs on the neighbor-graph connectivities.
"""

import numpy as np
import scipy.sparse as sp

from dance_tpu.modules.base import BaseClusteringMethod
from dance_tpu.transforms import AnnDataTransform, CellPCA, Compose, SetConfig
from dance_tpu.transforms.graph import NeighborGraph
from dance_tpu.typing import LogLevel, Optional


class Louvain(BaseClusteringMethod):

    _DISPLAY_ATTRS = ("resolution",)

    def __init__(self, resolution: float = 1.0, seed: int = 0):
        self.resolution = resolution
        self.seed = seed

    @staticmethod
    def preprocessing_pipeline(dim: int = 50, n_neighbors: int = 17,
                               log_level: LogLevel = "INFO"):
        return Compose(
            AnnDataTransform("sc.pp.normalize_total", target_sum=1e4),
            AnnDataTransform("sc.pp.log1p"),
            CellPCA(n_components=dim),
            NeighborGraph(n_neighbors=n_neighbors),
            SetConfig({"feature_channel": "NeighborGraph",
                       "feature_channel_type": "obsp", "label_channel": "label",
                       "label_channel_type": "obs"}),
            log_level=log_level,
        )

    def fit(self, adj, partition=None, weight="weight", randomize=None,
            random_state: Optional[int] = None):
        from dance_tpu.ops.cluster import louvain
        self.pred = louvain(sp.csr_matrix(adj), resolution=self.resolution,
                            seed=random_state if random_state is not None else self.seed)
        return self

    def predict(self, x=None):
        return self.pred


# --------------------------------------------------------------------------
# python-louvain module API (parity: louvain.py — the reference vendors the
# library wholesale). These accept a scipy/numpy adjacency in place of a
# networkx graph (networkx is absent in this environment; an adjacency
# matrix carries the same information).
# --------------------------------------------------------------------------

def check_random_state(seed):
    """Normalize a seed/Generator/RandomState to a RandomState
    (parity: louvain.py check_random_state)."""
    if seed is None or isinstance(seed, (int, np.integer)):
        return np.random.RandomState(seed)
    if isinstance(seed, np.random.RandomState):
        return seed
    if isinstance(seed, np.random.Generator):
        return np.random.RandomState(seed.integers(2 ** 31))
    raise ValueError(f"{seed!r} cannot be used to seed a RandomState")


def best_partition(graph, partition=None, weight="weight", resolution=1.0,
                   randomize=None, random_state=None):
    """Community partition maximizing modularity (parity: best_partition).

    ``graph`` is a (sparse) adjacency matrix; returns {node index: community}.
    """
    from dance_tpu.ops.cluster import louvain
    seed = (check_random_state(random_state).randint(2 ** 31)
            if (randomize or random_state is not None) else 0)
    labels = louvain(sp.csr_matrix(graph), resolution=resolution, seed=seed)
    return {i: int(c) for i, c in enumerate(labels)}


def modularity(partition, graph, weight="weight") -> float:
    """Newman modularity Q of a partition over an adjacency
    (parity: louvain.py modularity)."""
    a = sp.csr_matrix(graph)
    m2 = a.sum()  # 2m for symmetric adjacencies
    if m2 == 0:
        raise ValueError("A graph without link has an undefined modularity")
    labels = np.asarray([partition[i] for i in range(a.shape[0])])
    deg = np.asarray(a.sum(1)).ravel()
    q = 0.0
    for c in np.unique(labels):
        idx = np.nonzero(labels == c)[0]
        inside = a[idx][:, idx].sum()
        dc = deg[idx].sum()
        q += inside / m2 - (dc / m2) ** 2
    return float(q)


def induced_graph(partition, graph, weight="weight"):
    """Community-collapsed adjacency: one node per community, edge weights
    summed (parity: louvain.py induced_graph)."""
    a = sp.coo_matrix(graph)
    labels = np.asarray([partition[i] for i in range(a.shape[0])])
    k = int(labels.max()) + 1
    return sp.csr_matrix((a.data, (labels[a.row], labels[a.col])),
                         shape=(k, k))


def generate_dendrogram(graph, part_init=None, weight="weight",
                        resolution=1.0, randomize=None, random_state=None):
    """Hierarchy of partitions, coarsest last (parity: generate_dendrogram).

    The first-party optimizer returns its final flat partition; the
    dendrogram therefore has a single level (each node its own community at
    level -1 is implicit, like python-louvain's contracted levels)."""
    return [best_partition(graph, part_init, weight, resolution, randomize,
                           random_state)]


def partition_at_level(dendrogram, level):
    """Compose dendrogram levels 0..level into one node->community map
    (parity: louvain.py partition_at_level)."""
    partition = dendrogram[0].copy()
    for index in range(1, level + 1):
        for node, community in partition.items():
            partition[node] = dendrogram[index][community]
    return partition

"""Graph-construction transforms (parity: dance/transforms/graph/)."""

from dance_tpu.transforms.graph.cell_feature_graph import (CellFeatureBipartiteGraph,
                                                           CellFeatureGraph,
                                                           PCACellFeatureGraph)
from dance_tpu.transforms.graph.feature_feature_graph import FeatureFeatureGraph
from dance_tpu.transforms.graph.neighbor_graph import NeighborGraph
from dance_tpu.transforms.graph.spatial_graph import (SMEGraph, SpaGCNGraph, SpaGCNGraph2D,
                                                      StagateGraph)
from dance_tpu.transforms.graph.dstg_graph import DSTGraph
from dance_tpu.transforms.graph.heteronet_graph import HeteronetGraph
from dance_tpu.transforms.graph.resept_graph import RESEPTGraph
from dance_tpu.transforms.graph.scmogcn_graph import ScMoGNNGraph

__all__ = ["CellFeatureBipartiteGraph", "CellFeatureGraph", "DSTGraph",
           "FeatureFeatureGraph", "HeteronetGraph", "NeighborGraph",
           "PCACellFeatureGraph", "RESEPTGraph", "SMEGraph", "ScMoGNNGraph",
           "SpaGCNGraph", "SpaGCNGraph2D", "StagateGraph"]

"""Spatial-domain identification (parity: dance/modules/spatial/spatial_domain)."""

from dance_tpu.modules.spatial.spatial_domain.EfNST import EfNsSTRunner, Refiner
from dance_tpu.modules.spatial.spatial_domain.louvain import Louvain
from dance_tpu.modules.spatial.spatial_domain.spagcn import SpaGCN
from dance_tpu.modules.spatial.spatial_domain.stagate import Stagate
from dance_tpu.modules.spatial.spatial_domain.stlearn import StKmeans, StLouvain

__all__ = ["EfNsSTRunner", "Louvain", "Refiner", "SpaGCN", "Stagate", "StKmeans",
           "StLouvain"]

"""Clustering methods (parity: dance/modules/single_modality/clustering)."""

from dance_tpu.modules.single_modality.clustering.graphsc import GraphSC
from dance_tpu.modules.single_modality.clustering.scdcc import ScDCC
from dance_tpu.modules.single_modality.clustering.scdeepcluster import ScDeepCluster
from dance_tpu.modules.single_modality.clustering.scdsc import ScDSC
from dance_tpu.modules.single_modality.clustering.sctag import ScTAG

__all__ = ["GraphSC", "ScDCC", "ScDSC", "ScDeepCluster", "ScTAG"]

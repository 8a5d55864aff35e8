"""Framework-native graph structures (DGL replacement).

Graphs are *static-shape array containers*: a scipy CSR adjacency on the host
(built once by transforms) and a :class:`DeviceGraph` pytree — CSRMatrix +
node-feature dict — on device. GNN layers consume DeviceGraph under jit; no
dynamic graph objects ever cross the trace boundary (SURVEY.md §2.8).
"""

from dance_tpu.graph.base import DeviceGraph, Graph

__all__ = ["DeviceGraph", "Graph"]

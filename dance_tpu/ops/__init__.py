"""Device numerics layer: jitted linear algebra, clustering, and sparse ops.

This is where the reference's scipy/sklearn/numba dependency surface
(SURVEY.md §2.8) becomes first-party TPU code: randomized PCA/SVD, Lloyd
KMeans, exact kNN, NMF multiplicative updates, and CSR-as-arrays sparse
matrix ops all run under jit on the MXU.
"""

from dance_tpu.ops.cluster import kmeans
from dance_tpu.ops.forest import RandomForest
from dance_tpu.ops.linalg import pca, randomized_svd
from dance_tpu.ops.neighbors import knn_graph
from dance_tpu.ops.sparse import CSRMatrix, csr_from_scipy, csr_matvec, csr_to_scipy

__all__ = ["CSRMatrix", "RandomForest", "csr_from_scipy", "csr_matvec",
           "csr_to_scipy", "kmeans", "knn_graph", "pca", "randomized_svd"]

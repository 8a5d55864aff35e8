"""Static-shape sparse matrices for XLA.

The reference leans on scipy.sparse + DGL's C++ SpMM (SURVEY.md §2.8). On TPU,
dynamic sparsity patterns defeat XLA tiling, so sparse matrices live as a
*static-shape CSR triplet of dense arrays* — (data, indices, indptr) — that is
jit/pjit-traceable as a pytree. Matvec/matmat are formulated as segment-sums
(XLA path here; the Pallas kernel in ops/pallas specializes the hot case).
"""

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp


@jax.tree_util.register_pytree_node_class
class CSRMatrix:
    """CSR sparse matrix as a pytree of device arrays.

    ``shape`` is pytree aux-data so it stays a static Python tuple under jit
    (segment_sum needs a concrete ``num_segments``).
    """

    def __init__(self, data, indices, indptr, shape: Tuple[int, int]):
        self.data = data          # (nnz,)
        self.indices = indices    # (nnz,) column index per entry
        self.indptr = indptr      # (nrows + 1,)
        self.shape = tuple(shape)

    def tree_flatten(self):
        return (self.data, self.indices, self.indptr), self.shape

    @classmethod
    def tree_unflatten(cls, shape, children):
        return cls(*children, shape)

    def _replace(self, **kwargs) -> "CSRMatrix":
        fields = {"data": self.data, "indices": self.indices, "indptr": self.indptr,
                  "shape": self.shape}
        fields.update(kwargs)
        return CSRMatrix(**fields)

    @property
    def nnz(self) -> int:
        return self.data.shape[0]

    def row_ids(self) -> jax.Array:
        """Expand indptr to a per-entry row id array (jit-friendly)."""
        return _indptr_to_rows(self.indptr, self.nnz)

    def __repr__(self):
        return f"CSRMatrix(shape={self.shape}, nnz={self.nnz})"


def _indptr_to_rows(indptr, nnz: int):
    # row id of entry k = (number of row starts <= k) - 1, via searchsorted
    return jnp.searchsorted(indptr, jnp.arange(nnz, dtype=indptr.dtype), side="right") - 1


def csr_from_scipy(mat: sp.spmatrix, dtype=jnp.float32) -> CSRMatrix:
    mat = sp.csr_matrix(mat)
    return CSRMatrix(jnp.asarray(mat.data, dtype=dtype), jnp.asarray(mat.indices, jnp.int32),
                     jnp.asarray(mat.indptr, jnp.int32), mat.shape)


def csr_from_dense(x, dtype=jnp.float32) -> CSRMatrix:
    return csr_from_scipy(sp.csr_matrix(np.asarray(x)), dtype=dtype)


def csr_to_scipy(mat: CSRMatrix) -> sp.csr_matrix:
    return sp.csr_matrix((np.asarray(mat.data), np.asarray(mat.indices),
                          np.asarray(mat.indptr)), shape=mat.shape)


def csr_to_dense(mat: CSRMatrix) -> jax.Array:
    rows = mat.row_ids()
    out = jnp.zeros(mat.shape, dtype=mat.data.dtype)
    return out.at[rows, mat.indices].add(mat.data)


@jax.jit
def csr_matvec(mat: CSRMatrix, v: jax.Array) -> jax.Array:
    """y = A @ v via gather + segment_sum."""
    rows = mat.row_ids()
    prod = mat.data * jnp.take(v, mat.indices)
    return jax.ops.segment_sum(prod, rows, num_segments=mat.shape[0])


@jax.jit
def csr_matmat(mat: CSRMatrix, B: jax.Array) -> jax.Array:
    """Y = A @ B (B dense, (ncols, d)) via gather + segment_sum over rows."""
    rows = mat.row_ids()
    gathered = jnp.take(B, mat.indices, axis=0) * mat.data[:, None]
    return jax.ops.segment_sum(gathered, rows, num_segments=mat.shape[0])


@jax.jit
def csr_rmatmat(mat: CSRMatrix, B: jax.Array) -> jax.Array:
    """Y = A.T @ B via scatter-add over columns."""
    rows = mat.row_ids()
    gathered = jnp.take(B, rows, axis=0) * mat.data[:, None]
    return jax.ops.segment_sum(gathered, mat.indices, num_segments=mat.shape[1])


def csr_row_sums(mat: CSRMatrix) -> jax.Array:
    return jax.ops.segment_sum(mat.data, mat.row_ids(), num_segments=mat.shape[0])


def csr_col_sums(mat: CSRMatrix) -> jax.Array:
    return jax.ops.segment_sum(mat.data, mat.indices, num_segments=mat.shape[1])


def csr_scale_rows(mat: CSRMatrix, scale: jax.Array) -> CSRMatrix:
    """Multiply row i by scale[i] without densifying."""
    return mat._replace(data=mat.data * jnp.take(scale, mat.row_ids()))


def csr_scale_cols(mat: CSRMatrix, scale: jax.Array) -> CSRMatrix:
    return mat._replace(data=mat.data * jnp.take(scale, mat.indices))


@jax.tree_util.register_pytree_node_class
class DenseAdj:
    """Dense device adjacency: SpMM as ONE MXU matmul.

    Above a few percent density every sparse format loses on TPU — the
    gather/segment path moves nnz×d message bytes through HBM (and OOMs past
    ~10M edges × 200 dims), while the Pallas BSR grid degenerates to a fully
    populated block matrix streamed with per-tile overhead.  The systolic
    array does the same contraction at peak from a plain dense operand
    (measured: graph-sc at 16% density, 12k nodes — 2345 ms/epoch BSR vs
    ~8 ms dense).  ``degrees`` carries the per-row nonzero counts so mean
    aggregation doesn't re-derive the pattern in-trace.
    """

    def __init__(self, mat, degrees):
        self.mat = mat          # (n, m) dense weights, 0 = no edge
        self.degrees = degrees  # (n,) float nonzero count per row

    def tree_flatten(self):
        return (self.mat, self.degrees), None

    @classmethod
    def tree_unflatten(cls, _, children):
        return cls(*children)

    @property
    def shape(self):
        return self.mat.shape

    @property
    def nnz(self) -> int:
        # static upper bound (dense storage); true count is degrees.sum()
        return self.mat.shape[0] * self.mat.shape[1]

    def __repr__(self):
        return f"DenseAdj(shape={self.mat.shape})"


def dense_adj_from_scipy(adj, dtype=jnp.float32) -> DenseAdj:
    import numpy as np
    import scipy.sparse as sp
    adj = sp.csr_matrix(adj)
    deg = np.diff(adj.indptr).astype(np.float32)
    return DenseAdj(jnp.asarray(np.asarray(adj.todense()), dtype),
                    jnp.asarray(deg))


__all__ = ["AdaptiveBSR", "CSRMatrix", "DenseAdj", "csr_col_sums", "csr_from_dense",
           "csr_from_scipy", "csr_matmat", "csr_matvec", "csr_rmatmat", "csr_row_sums",
           "csr_scale_cols", "csr_scale_rows", "csr_to_dense", "csr_to_scipy",
           "dense_adj_from_scipy"]


@jax.tree_util.register_pytree_node_class
class AdaptiveBSR:
    """Static decomposition of AdaptiveSAGE message passing onto the Pallas
    block-sparse SpMM (the scDeepSort fast path).

    On the bipartite cell-gene graph every off-diagonal edge's alpha factor is
    a property of its gene endpoint: gene->cell edges use alpha[src_gene],
    cell->gene edges use alpha[dst_gene] (reference models/nn/gnn.py:62-83).
    With node scale ``s[v] = alpha[gene_idx[v]]`` for genes and 1 for cells,

        sum_e w_e * alpha_e * h_src  ==  s ⊙ (A_off @ (s ⊙ h)) + w_diag * alpha_self * h

    so the whole edge-gather collapses into ONE block-sparse matmul over the
    static off-diagonal adjacency plus elementwise terms. ``deg`` holds the
    incoming-edge counts (incl. self-loops) for the mean aggregation.
    """

    def __init__(self, bsr, w_diag, gene_idx, deg, n_genes: int):
        self.bsr = bsr
        self.w_diag = w_diag    # (n,) self-loop weight per node (0 if absent)
        self.gene_idx = gene_idx  # (n,) gene index per node, -1 for cells
        self.deg = deg          # (n,) incoming edge counts incl self-loops
        self.n_genes = n_genes

    def tree_flatten(self):
        return (self.bsr, self.w_diag, self.gene_idx, self.deg), self.n_genes

    @classmethod
    def tree_unflatten(cls, n_genes, children):
        return cls(*children, n_genes)

    @property
    def shape(self):
        return (self.w_diag.shape[0], self.w_diag.shape[0])

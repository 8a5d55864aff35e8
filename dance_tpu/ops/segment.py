"""Segment ops over CSR graphs: the message-passing primitive layer.

Replaces DGL's C++ SpMM/SDDMM update_all kernels (SURVEY.md §2.8). All ops are
formulated as gather + segment_sum/segment_max over the per-edge row-id array,
which XLA lowers to efficient sorted-scatter code on TPU.
"""

import jax
import jax.numpy as jnp

from dance_tpu.ops.sparse import CSRMatrix


def gather_src(adj: CSRMatrix, h: jax.Array) -> jax.Array:
    """Per-edge source features: h[src] for each edge (row = dst layout)."""
    return jnp.take(h, adj.indices, axis=0)


def aggregate(adj: CSRMatrix, messages: jax.Array, op: str = "sum") -> jax.Array:
    """Aggregate per-edge messages to destination nodes."""
    rows = adj.row_ids()
    n = adj.shape[0]
    if op == "sum":
        return jax.ops.segment_sum(messages, rows, num_segments=n)
    if op == "mean":
        s = jax.ops.segment_sum(messages, rows, num_segments=n)
        deg = jax.ops.segment_sum(jnp.ones_like(rows, dtype=messages.dtype), rows,
                                  num_segments=n)
        return s / jnp.maximum(deg, 1.0)[:, None]
    if op == "max":
        return jax.ops.segment_max(messages, rows, num_segments=n)
    raise ValueError(f"Unknown aggregation {op!r}")


def spmm(adj, h: jax.Array, *, weighted: bool = True, op: str = "sum",
         degrees: jax.Array = None, n_out: int = None) -> jax.Array:
    """A @ H with optional edge weights — the core message-passing op.

    Accepts either a :class:`CSRMatrix` (gather + segment_sum, fully general)
    or a :class:`~dance_tpu.ops.pallas_kernels.BSRMatrix` (Pallas block-sparse
    kernel — ~10× faster on chip). BSR handles weighted sums natively; for
    ``op='mean'`` pass ``degrees`` (the per-row incoming-edge counts; the |A|>0
    pattern is not recoverable from the dense tiles alone — graph builders
    know it statically). For rectangular BSR adjacencies (bipartite graphs)
    pass ``n_out`` — the true output row count; it defaults to ``h.shape[0]``,
    which is only correct for square graphs.
    """
    from dance_tpu.ops.pallas_kernels import BSRMatrix, bsr_spmm_ad, bsr_spmm_max
    from dance_tpu.ops.sparse import DenseAdj
    from dance_tpu.parallel.sharded_graph import ShardedCSR, sharded_spmm
    if isinstance(adj, ShardedCSR):
        return sharded_spmm(adj, h, weighted=weighted, op=op, degrees=degrees)
    if isinstance(adj, DenseAdj):
        # high-density graphs: one MXU matmul (see DenseAdj docstring)
        if op not in ("sum", "mean"):
            raise ValueError("DenseAdj supports sum/mean aggregation; use the "
                             "CSR adjacency for max")
        mat = adj.mat if weighted else (adj.mat != 0).astype(h.dtype)
        out = mat @ h
        if op == "mean":
            out = out / jnp.maximum(adj.degrees, 1.0)[:, None]
        return out
    if isinstance(adj, BSRMatrix):
        if op not in ("sum", "mean", "max"):
            raise ValueError(f"Unknown aggregation {op!r}")
        if not weighted and op != "max":
            raise ValueError("BSR path supports weighted sum/mean and "
                             "(un)weighted max; use the CSR adjacency for "
                             "unweighted sum/mean")
        if op == "mean" and degrees is None:
            raise ValueError("BSR mean aggregation needs the per-row edge-count "
                             "vector (degrees=...) from the graph builder")
        n = n_out if n_out is not None else h.shape[0]
        hp = jnp.pad(h, ((0, adj.shape[1] - h.shape[0]), (0, 0)))
        if op == "max":
            # masked VPU max over the same tile stream (forward-only)
            return bsr_spmm_max(adj, hp, weighted=weighted)[:n]
        out = bsr_spmm_ad(adj, hp)[:n]
        if op == "mean":
            out = out / jnp.maximum(degrees[:n], 1.0)[:, None]
        return out
    msgs = gather_src(adj, h)
    if weighted:
        msgs = msgs * adj.data[:, None]
    return aggregate(adj, msgs, op=op)


def edge_softmax(adj: CSRMatrix, logits: jax.Array) -> jax.Array:
    """Softmax of per-edge logits over each destination's incoming edges.

    Replaces DGL's edge_softmax (GAT attention normalization)."""
    rows = adj.row_ids()
    n = adj.shape[0]
    maxes = jax.ops.segment_max(logits, rows, num_segments=n)
    maxes = jnp.where(jnp.isfinite(maxes), maxes, 0.0)
    exp = jnp.exp(logits - jnp.take(maxes, rows, axis=0))
    denom = jax.ops.segment_sum(exp, rows, num_segments=n)
    return exp / jnp.maximum(jnp.take(denom, rows, axis=0), 1e-12)


def sddmm_dot(adj: CSRMatrix, a: jax.Array, b: jax.Array) -> jax.Array:
    """Per-edge dot products a[dst]·b[src] (sampled dense-dense matmul)."""
    rows = adj.row_ids()
    return jnp.sum(jnp.take(a, rows, axis=0) * jnp.take(b, adj.indices, axis=0), axis=-1)


def in_degrees(adj: CSRMatrix) -> jax.Array:
    return (adj.indptr[1:] - adj.indptr[:-1]).astype(jnp.float32)


def out_degrees(adj: CSRMatrix) -> jax.Array:
    n = adj.shape[1]
    return jax.ops.segment_sum(jnp.ones_like(adj.indices, dtype=jnp.float32),
                               adj.indices, num_segments=n)


__all__ = ["aggregate", "edge_softmax", "gather_src", "in_degrees", "out_degrees",
           "sddmm_dot", "spmm"]

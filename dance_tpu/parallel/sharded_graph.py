"""Block-row-sharded sparse adjacency for multi-chip message passing.

The reference scales GNNs only by DGL's sampler workers (SURVEY.md §2.8);
here the graph itself partitions across the mesh: destination rows split
into contiguous per-device chunks, each chunk's CSR entries padded to the
max chunk nnz, and the SpMM runs under ``jax.shard_map`` — every device
segment-sums its own edge block while the (much smaller) dense feature
matrix is all-gathered across ICI at the shard_map boundary.  Edge storage
per device drops to ~1/D of the graph, so graphs beyond one chip's HBM
become trainable.

Used by ``fit_distributed`` in scDeepSort and graph-sc; exercised by
``dryrun_multichip`` and the 8-CPU-mesh equality tests.
"""

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@jax.tree_util.register_pytree_node_class
class ShardedCSR:
    """CSR split into per-device block-row chunks (leading axis = device).

    ``data``/``indices``/``local_rows`` are (D, E_max) arrays whose leading
    axis is sharded over the mesh's dp axis; padding entries carry weight 0
    (their contribution vanishes).  ``edge_data`` holds extra per-edge int
    arrays partitioned the same way (e.g. AdaptiveSAGE's alpha index).
    ``shape`` is the true (unpadded) matrix shape; ``rows_per_shard`` the
    padded per-device row count.
    """

    def __init__(self, data, indices, local_rows, edge_data: Dict,
                 shape: Tuple[int, int], rows_per_shard: int, axis: str = "dp",
                 degrees=None, mesh: Optional[Mesh] = None):
        self.data = data
        self.indices = indices
        self.local_rows = local_rows
        self.edge_data = edge_data
        self.shape = tuple(shape)
        self.rows_per_shard = int(rows_per_shard)
        self.axis = axis
        self.degrees = degrees      # (n,) true in-degree counts, or None
        self.mesh = mesh            # static: the mesh the shards live on

    def tree_flatten(self):
        keys = tuple(sorted(self.edge_data))
        children = (self.data, self.indices, self.local_rows, self.degrees,
                    tuple(self.edge_data[k] for k in keys))
        return children, (keys, self.shape, self.rows_per_shard, self.axis,
                          self.mesh)

    @classmethod
    def tree_unflatten(cls, aux, children):
        keys, shape, rows_per_shard, axis, mesh = aux
        data, indices, local_rows, degrees, extra = children
        return cls(data, indices, local_rows, dict(zip(keys, extra)), shape,
                   rows_per_shard, axis, degrees, mesh)

    @property
    def n_shards(self) -> int:
        return self.data.shape[0]

    def __repr__(self):
        return (f"ShardedCSR(shape={self.shape}, shards={self.n_shards}, "
                f"edges_per_shard={self.data.shape[1]})")


def shard_csr(adj: sp.spmatrix, mesh: Optional[Mesh] = None, axis: str = "dp",
              edge_data: Optional[Dict[str, np.ndarray]] = None) -> ShardedCSR:
    """Host-side partition of a scipy CSR into mesh-sharded block rows.

    ``edge_data`` maps names to per-edge arrays in the CSR's edge order
    (e.g. a precomputed alpha index); they are chunked and padded alongside.
    """
    from dance_tpu.parallel.mesh import current_mesh
    mesh = mesh or current_mesh()
    d = mesh.shape[axis]
    adj = sp.csr_matrix(adj)
    n, m = adj.shape
    rows_per = -(-n // d)
    chunks = []
    for s in range(d):
        r0, r1 = s * rows_per, min((s + 1) * rows_per, n)
        if r0 >= n:
            chunks.append((np.zeros(0, np.float32), np.zeros(0, np.int32),
                           np.zeros(0, np.int32), r0, r0))
            continue
        block = adj[r0:r1]
        rows_local = np.repeat(np.arange(r1 - r0, dtype=np.int32),
                               np.diff(block.indptr))
        chunks.append((block.data.astype(np.float32),
                       block.indices.astype(np.int32), rows_local, r0, r1))
    e_max = max(1, max(len(c[0]) for c in chunks))

    def pad(arr, fill=0):
        return np.concatenate([arr, np.full(e_max - len(arr), fill,
                                            dtype=arr.dtype)])

    data = np.stack([pad(c[0]) for c in chunks])
    indices = np.stack([pad(c[1]) for c in chunks])
    local_rows = np.stack([pad(c[2]) for c in chunks])
    extra = {}
    if edge_data:
        ptr = adj.indptr
        for name, arr in edge_data.items():
            arr = np.asarray(arr)
            parts = []
            for s in range(d):
                r0, r1 = s * rows_per, min((s + 1) * rows_per, n)
                seg = (arr[ptr[r0]:ptr[r1]] if r0 < n
                       else np.zeros(0, dtype=arr.dtype))
                parts.append(pad(seg))
            extra[name] = jax.device_put(
                np.stack(parts), NamedSharding(mesh, P(axis, None)))
    sh = NamedSharding(mesh, P(axis, None))
    degrees = jax.device_put(np.diff(adj.indptr).astype(np.float32),
                             NamedSharding(mesh, P()))
    return ShardedCSR(jax.device_put(data, sh), jax.device_put(indices, sh),
                      jax.device_put(local_rows, sh), extra, (n, m), rows_per,
                      axis, degrees, mesh)


def sharded_spmm(s: ShardedCSR, h: jax.Array, *, weighted: bool = True,
                 op: str = "sum", degrees: Optional[jax.Array] = None,
                 mesh: Optional[Mesh] = None,
                 edge_scale: Optional[jax.Array] = None) -> jax.Array:
    """A @ H over a :class:`ShardedCSR` — one shard_map program.

    Each device segment-sums its block-row edge chunk; ``h`` is declared
    replicated at the shard_map boundary, so a dp-sharded ``h`` incurs one
    all-gather over ICI (the dense features are far smaller than the edges).
    ``op='mean'`` divides by ``degrees`` (true in-degrees, else computed from
    padded weights would be wrong — pass them).  ``edge_scale``: optional
    (D, E_max) per-edge multiplier (already sharded), e.g. alpha gathers.
    Output rows are dp-sharded.
    """
    if mesh is None:
        # the ShardedCSR carries its own mesh as static aux — never trust a
        # global (another mesh may have been built since shard_csr ran)
        mesh = s.mesh
    if mesh is None:
        from dance_tpu.parallel.mesh import current_mesh
        mesh = current_mesh()
    n, _ = s.shape
    rps = s.rows_per_shard
    axis = s.axis
    n_extra = 1 if edge_scale is not None else 0

    def local(data, idx, rows, h, *extra):
        msgs = jnp.take(h, idx[0], axis=0)
        if weighted:
            msgs = msgs * data[0][:, None]
        if n_extra:
            msgs = msgs * extra[0][0][:, None]
        return jax.ops.segment_sum(msgs, rows[0], num_segments=rps)

    in_specs = [P(axis, None)] * 3 + [P(None, None)] + [P(axis, None)] * n_extra
    args = [s.data, s.indices, s.local_rows, h]
    if n_extra:
        args.append(edge_scale)
    out = jax.shard_map(local, mesh=mesh, in_specs=tuple(in_specs),
                        out_specs=P(axis, None))(*args)
    out = out.reshape(-1, h.shape[1])[:n]
    if op == "mean":
        if degrees is None:
            degrees = s.degrees
        if degrees is None:
            raise ValueError("sharded mean aggregation needs the true "
                             "in-degree vector (degrees=...)")
        out = out / jnp.maximum(degrees, 1.0)[:, None]
    elif op != "sum":
        raise ValueError(f"unsupported sharded aggregation {op!r}")
    return out


__all__ = ["ShardedCSR", "shard_csr", "sharded_spmm"]

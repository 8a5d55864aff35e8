"""Exact kNN + neighbor graphs on device.

Replaces scanpy's `sc.pp.neighbors` (used by NeighborGraph,
dance/transforms/graph/neighbor_graph.py:9) and sklearn NearestNeighbors (MAGIC
kernel, SME graphs). Exact top-k over a tiled distance matrix: each (tile ×
full) block is one MXU matmul followed by a top_k — O(n²d) FLOPs but
bandwidth-friendly and trivially sharded over the cells axis.
"""

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

HI = jax.lax.Precision.HIGHEST


@partial(jax.jit, static_argnames=("k",))
def _knn_block(q, x, k: int):
    d2 = ((q ** 2).sum(1)[:, None] + (x ** 2).sum(1)[None, :]
          - 2 * jnp.dot(q, x.T, precision=HI))
    n = d2.shape[1]
    # two-stage top-k: lax.top_k fully sorts its axis on TPU, so split the n
    # candidates into groups, take top-k per group (short sorts), then a final
    # top-k over the G*k survivors. Exact iff k <= group (each group keeps k
    # candidates, and the true top-k contains at most k from any one group).
    group = 2048
    if n > 2 * group and k <= group:
        g = -(-n // group)
        pad = g * group - n
        d2p = jnp.pad(d2, ((0, 0), (0, pad)), constant_values=jnp.inf)
        d3 = d2p.reshape(d2.shape[0], g, group)
        neg_g, idx_g = jax.lax.top_k(-d3, min(k, group))   # (m, g, k)
        base = (jnp.arange(g, dtype=jnp.int32) * group)[None, :, None]
        cand_idx = (idx_g + base).reshape(d2.shape[0], -1)  # (m, g*k)
        neg, pos = jax.lax.top_k(neg_g.reshape(d2.shape[0], -1), k)
        idx = jnp.take_along_axis(cand_idx, pos, axis=1)
    else:
        neg, idx = jax.lax.top_k(-d2, k)
    return jnp.sqrt(jnp.maximum(-neg, 0.0)), idx


def knn(x, k: int, *, include_self: bool = True, block_size: int = 4096,
        method: str = "auto") -> Tuple[np.ndarray, np.ndarray]:
    """Exact kNN over rows of x. Returns (distances, indices), each (n, k).

    method: 'device' tiles the distance matrix over the MXU (right for
    high-dimensional features); 'kdtree' queries a host scipy cKDTree
    (right for 2-3D spatial coordinates, where the O(n^2) distance matrix
    is 40 GB of pointless traffic at 100k spots — measured 1141 s device
    vs 0.74 s KD-tree); 'auto' picks kdtree iff dim <= 3.
    """
    n = x.shape[0]
    kq = k if include_self else k + 1
    if kq > n:
        raise ValueError(
            f"knn: k={k} (include_self={include_self}) needs at least "
            f"{kq} points but only {n} are available; clamp k at the call "
            f"site (e.g. k=min(k, n-1)) to keep the (n, k) result contract")
    if method == "auto":
        method = "kdtree" if x.shape[1] <= 3 else "device"
    if method == "kdtree":
        from scipy.spatial import cKDTree
        xh = np.asarray(x, np.float32)
        d, i = cKDTree(xh).query(xh, k=kq)
        d = d.astype(np.float32)
        i = i.astype(np.int64)
        if kq == 1:
            d, i = d[:, None], i[:, None]
    else:
        xd = jnp.asarray(x, jnp.float32)
        dists, idxs = [], []
        for start in range(0, n, block_size):
            q = xd[start:start + block_size]
            db, ib = _knn_block(q, xd, kq)
            dists.append(db)
            idxs.append(ib)
        # concatenate on device, pull once (single host round trip)
        d = np.asarray(jnp.concatenate(dists, 0))
        i = np.asarray(jnp.concatenate(idxs, 0))
    if not include_self:
        # drop the self column (distance 0 at position of own index)
        self_col = i == np.arange(n)[:, None]
        # ensure exactly one drop per row: mark first occurrence
        keep = ~self_col
        first_self = self_col.argmax(1)
        rows_no_self = ~self_col.any(1)
        keep[rows_no_self, kq - 1] = False  # drop farthest when self missing
        d = d[keep].reshape(n, kq - 1)
        i = i[keep].reshape(n, kq - 1)
    return d, i


def knn_graph(x, k: int, *, mode: str = "connectivity", include_self: bool = False,
              symmetrize: bool = True) -> sp.csr_matrix:
    """Build a kNN graph as scipy CSR (host) from device-computed neighbors.

    mode: 'connectivity' (0/1), 'distance', or 'gauss' (umap-like gaussian
    kernel on distances, scanpy-neighbors flavor).
    """
    d, i = knn(x, k, include_self=include_self)
    n = x.shape[0]
    rows = np.repeat(np.arange(n), i.shape[1])
    cols = i.ravel()
    if mode == "connectivity":
        vals = np.ones_like(cols, dtype=np.float32)
    elif mode == "distance":
        vals = d.ravel().astype(np.float32)
    elif mode == "gauss":
        sigma = np.maximum(d[:, -1:], 1e-12)
        vals = np.exp(-((d / sigma) ** 2)).ravel().astype(np.float32)
    else:
        raise ValueError(f"Unknown mode {mode!r}")
    g = sp.csr_matrix((vals, (rows, cols)), shape=(n, n))
    if symmetrize:
        g = g.maximum(g.T)
    return g


def radius_graph(coords, radius: float) -> sp.csr_matrix:
    """All pairs within ``radius`` (spatial graphs, e.g. STAGATE radius net)."""
    from dance_tpu.utils.matrix import pairwise_distance
    d = pairwise_distance(np.asarray(coords, np.float32))
    mask = (d <= radius) & ~np.eye(d.shape[0], dtype=bool)
    g = sp.csr_matrix(mask.astype(np.float32))
    return g


__all__ = ["knn", "knn_graph", "radius_graph"]

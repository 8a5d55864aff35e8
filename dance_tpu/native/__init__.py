"""Native host kernels: fixed-fanout neighbor sampling + graph construction.

The reference's minibatch GNN path runs on DGL's C++ NeighborSampler with
worker processes (dance/modules/.../scdeepsort.py:183,232-235). Here the
native side is first-party C++ (graph_sampler.cpp) bound via ctypes, emitting
*static-shape* padded neighbor blocks ready for double-buffered device feed.
The library is compiled on first import (g++, cached next to the source);
pure-numpy fallbacks keep every API functional without a toolchain.
"""

import ctypes
import os
import subprocess

import numpy as np

from dance_tpu.settings import logger

_SRC_DIR = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_SRC_DIR, "libdance_native.so")
_LIB = None


_SOURCES = ("graph_sampler.cpp", "louvain.cpp")


def _build() -> bool:
    srcs = [os.path.join(_SRC_DIR, s) for s in _SOURCES]
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", _SO_PATH, *srcs]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return True
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        logger.warning("Native build failed (%s); using numpy fallbacks", e)
        return False


def get_lib():
    """Load (building if needed) the native library, or None on failure."""
    global _LIB
    if _LIB is not None:
        return _LIB
    src_mtime = max(os.path.getmtime(os.path.join(_SRC_DIR, s)) for s in _SOURCES)
    if (not os.path.exists(_SO_PATH)
            or os.path.getmtime(_SO_PATH) < src_mtime):
        if not _build():
            return None
    lib = ctypes.CDLL(_SO_PATH)
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.csr_neighbor_sample.argtypes = [i64p, i32p, ctypes.c_void_p, i32p,
                                        ctypes.c_int64, ctypes.c_int64,
                                        ctypes.c_uint64, i32p, f32p]
    lib.csr_neighbor_sample.restype = None
    lib.build_bipartite_csr.argtypes = [i32p, i32p, f32p, ctypes.c_int64,
                                        ctypes.c_int64, ctypes.c_int64,
                                        ctypes.c_int, i64p, i32p, f32p]
    lib.build_bipartite_csr.restype = ctypes.c_int64
    lib.csr_subgraph.argtypes = [i64p, i32p, ctypes.c_void_p, ctypes.c_int64, i32p,
                                 ctypes.c_int64, i64p, i32p, f32p]
    lib.csr_subgraph.restype = ctypes.c_int64
    lib.louvain_csr.argtypes = [i64p, i32p, f32p, ctypes.c_int64,
                                ctypes.c_double, ctypes.c_uint64,
                                ctypes.c_int32, ctypes.c_int32, i32p]
    lib.louvain_csr.restype = ctypes.c_int32
    _LIB = lib
    return _LIB


def neighbor_sample(indptr, indices, seeds, fanout: int, *, weights=None,
                    seed: int = 0):
    """Fixed-fanout neighbor sample: returns (n_seeds, fanout) idx + weights."""
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int32)
    seeds = np.ascontiguousarray(seeds, np.int32)
    n_seeds = len(seeds)
    out_idx = np.empty(n_seeds * fanout, np.int32)
    out_w = np.empty(n_seeds * fanout, np.float32)
    lib = get_lib()
    if lib is not None:
        w = (np.ascontiguousarray(weights, np.float32) if weights is not None else None)
        wp = w.ctypes.data_as(ctypes.c_void_p) if w is not None else None
        lib.csr_neighbor_sample(indptr, indices, wp, seeds, n_seeds, fanout, seed,
                                out_idx, out_w)
    else:  # numpy fallback
        rng = np.random.default_rng(seed)
        for i, u in enumerate(seeds):
            nbrs = indices[indptr[u]:indptr[u + 1]]
            ws = (weights[indptr[u]:indptr[u + 1]] if weights is not None
                  else np.ones(len(nbrs), np.float32))
            if len(nbrs) == 0:
                out_idx[i * fanout:(i + 1) * fanout] = u
                out_w[i * fanout:(i + 1) * fanout] = 0
                continue
            if len(nbrs) <= fanout:
                pad = rng.integers(0, len(nbrs), fanout - len(nbrs))
                sel = np.concatenate([np.arange(len(nbrs)), pad])
            else:
                sel = rng.choice(len(nbrs), fanout, replace=False)
            out_idx[i * fanout:(i + 1) * fanout] = nbrs[sel]
            out_w[i * fanout:(i + 1) * fanout] = ws[sel]
    return out_idx.reshape(n_seeds, fanout), out_w.reshape(n_seeds, fanout)


def build_bipartite_csr(rows, cols, vals, n_cells: int, n_genes: int,
                        add_self_loops: bool = True):
    """COO cell-gene entries -> undirected bipartite scipy CSR (genes first)."""
    import scipy.sparse as sp
    rows = np.ascontiguousarray(rows, np.int32)
    cols = np.ascontiguousarray(cols, np.int32)
    vals = np.ascontiguousarray(vals, np.float32)
    n_total = n_cells + n_genes
    cap = 2 * len(rows) + (n_total if add_self_loops else 0)
    lib = get_lib()
    if lib is None:  # scipy fallback
        src = np.concatenate([rows + n_genes, cols])
        dst = np.concatenate([cols, rows + n_genes])
        w = np.concatenate([vals, vals])
        adj = sp.csr_matrix((w, (dst, src)), shape=(n_total, n_total))
        if add_self_loops:
            adj = adj + sp.eye(n_total, format="csr", dtype=np.float32)
        return adj
    out_indptr = np.empty(n_total + 1, np.int64)
    out_indices = np.empty(cap, np.int32)
    out_weights = np.empty(cap, np.float32)
    nnz = lib.build_bipartite_csr(rows, cols, vals, len(rows), n_cells, n_genes,
                                  int(add_self_loops), out_indptr, out_indices,
                                  out_weights)
    return sp.csr_matrix((out_weights[:nnz], out_indices[:nnz], out_indptr),
                         shape=(n_total, n_total))


class NeighborSampler:
    """Static-shape minibatch block sampler (DGL DataLoader replacement).

    Yields ``(seeds, neighbor_idx, neighbor_w)`` blocks of fixed shape
    (batch_size, fanout) — padding the final batch by wrap-around so every
    batch compiles to the same XLA program.
    """

    def __init__(self, adj, fanout: int, batch_size: int, *, shuffle: bool = True,
                 seed: int = 0):
        import scipy.sparse as sp
        adj = sp.csr_matrix(adj)
        self.indptr = np.ascontiguousarray(adj.indptr, np.int64)
        self.indices = np.ascontiguousarray(adj.indices, np.int32)
        self.weights = np.ascontiguousarray(adj.data, np.float32)
        self.fanout = fanout
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed

    def sample_nodes(self, node_ids):
        return neighbor_sample(self.indptr, self.indices, node_ids, self.fanout,
                               weights=self.weights, seed=self.seed)

    def __call__(self, node_ids, epoch: int = 0):
        node_ids = np.asarray(node_ids, np.int32)
        rng = np.random.default_rng(self.seed + epoch)
        order = rng.permutation(len(node_ids)) if self.shuffle else np.arange(
            len(node_ids))
        n = len(order)
        for start in range(0, n, self.batch_size):
            sel = order[start:start + self.batch_size]
            if len(sel) < self.batch_size:  # wrap-pad to static shape
                sel = np.concatenate([sel, order[:self.batch_size - len(sel)]])
            seeds = node_ids[sel]
            idx, w = neighbor_sample(self.indptr, self.indices, seeds, self.fanout,
                                     weights=self.weights,
                                     seed=self.seed + epoch * 1000 + start)
            yield seeds, idx, w


def louvain_labels(adj, *, resolution: float = 1.0, seed: int = 0,
                   max_passes: int = 10, local_iters: int = 10):
    """Native Louvain over a (symmetric) scipy CSR adjacency.

    Returns int32 community labels (uncompacted), or None when the native
    library is unavailable (callers fall back to the numpy implementation in
    dance_tpu/ops/cluster.py).
    """
    lib = get_lib()
    if lib is None:
        return None
    import scipy.sparse as sp
    adj = sp.csr_matrix(adj)
    n = adj.shape[0]
    labels = np.empty(n, np.int32)
    lib.louvain_csr(np.ascontiguousarray(adj.indptr, np.int64),
                    np.ascontiguousarray(adj.indices, np.int32),
                    np.ascontiguousarray(adj.data, np.float32), n,
                    float(resolution), int(seed) & 0xFFFFFFFFFFFFFFFF,
                    int(max_passes), int(local_iters), labels)
    return labels


__all__ = ["NeighborSampler", "build_bipartite_csr", "get_lib", "louvain_labels",
           "neighbor_sample"]

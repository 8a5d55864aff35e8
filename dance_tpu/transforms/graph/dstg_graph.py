"""DSTG pseudo-real spot link graph (parity: dance/transforms/graph/dstg_graph.py).

Mutual-nearest-neighbor linkage in a CCA embedding between pseudo-spots
(reference split) and real spots, symmetric-normalized with self loops. CCA is
computed as the SVD of the cross-covariance (the standard fast implementation),
on device.
"""

import numpy as np
import scipy.sparse as sp

from dance_tpu.registry import register_preprocessor
from dance_tpu.transforms.base import BaseTransform
from dance_tpu.typing import Sequence, Union


def _l2norm(x):
    return x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)


def cca_embed(x_ref, x_inf, num_cc: int = 30):
    """CCA via SVD of standardized cross-covariance -> per-set embeddings."""
    from dance_tpu.ops.linalg import randomized_svd
    a = (x_ref - x_ref.mean(0)) / np.maximum(x_ref.std(0), 1e-12)
    b = (x_inf - x_inf.mean(0)) / np.maximum(x_inf.std(0), 1e-12)
    cross = a @ b.T  # (n_ref, n_inf)
    k = min(num_cc, min(cross.shape) - 1)
    u, s, vt = randomized_svd(cross.astype(np.float32), k)
    return np.asarray(u), np.asarray(vt).T


def _knn(emb_query, emb_base, k):
    from dance_tpu.ops.neighbors import _knn_block
    import jax.numpy as jnp
    d, i = _knn_block(jnp.asarray(emb_query, jnp.float32),
                      jnp.asarray(emb_base, jnp.float32), min(k, len(emb_base)))
    return np.asarray(i)


def compute_dstg_adj(x_ref, x_inf, k_filter: int = 200, num_cc: int = 30,
                     k_mnn: int = 30) -> sp.csr_matrix:
    """MNN link graph between pseudo and real spots, D^-1/2(A+I)D^-1/2 normalized."""
    n_ref, n_inf = len(x_ref), len(x_inf)
    emb_ref, emb_inf = cca_embed(x_ref, x_inf, num_cc)
    emb_ref, emb_inf = _l2norm(emb_ref), _l2norm(emb_inf)

    k = min(k_mnn, n_ref, n_inf)
    nn_ri = _knn(emb_ref, emb_inf, k)  # for each ref spot: nearest real spots
    nn_ir = _knn(emb_inf, emb_ref, k)  # for each real spot: nearest ref spots

    # mutual nearest neighbors
    pairs = set()
    inf_sets = [set(nn_ir[j]) for j in range(n_inf)]
    for i in range(n_ref):
        for j in nn_ri[i]:
            if i in inf_sets[j]:
                pairs.add((i, int(j)))

    # keep at most k_filter strongest links per real spot (cosine in embedding)
    by_inf = {}
    for i, j in pairs:
        by_inf.setdefault(j, []).append(i)
    rows, cols = [], []
    for j, refs in by_inf.items():
        sims = emb_inf[j] @ emb_ref[np.asarray(refs)].T
        order = np.argsort(-sims)[:k_filter]
        for idx in order:
            rows.append(n_ref + j)
            cols.append(refs[idx])

    n = n_ref + n_inf
    a = sp.csr_matrix((np.ones(len(rows), np.float32), (rows, cols)), shape=(n, n))
    a = a + a.T + sp.eye(n, format="csr", dtype=np.float32)
    deg = np.asarray(a.sum(1)).ravel()
    dinv = 1.0 / np.sqrt(np.maximum(deg, 1e-12))
    return (sp.diags(dinv) @ a @ sp.diags(dinv)).tocsr()


@register_preprocessor("graph", "reference")
class DSTGraph(BaseTransform):
    """Pseudo/real spot link graph into obsp (parity: dstg_graph.py:15)."""

    _DISPLAY_ATTRS = ("k_filter", "num_cc", "ref_split", "inf_split")

    def __init__(self, k_filter: int = 200, num_cc: int = 30, *,
                 ref_split: str = "train", inf_split: str = "test",
                 channels: Sequence[Union[str, None]] = (None, None),
                 channel_types: Sequence[Union[str, None]] = ("obsm", "obsm"), **kwargs):
        super().__init__(**kwargs)
        self.k_filter = k_filter
        self.num_cc = num_cc
        self.ref_split = ref_split
        self.inf_split = inf_split
        self.channels = channels
        self.channel_types = channel_types

    def __call__(self, data):
        x_ref = np.asarray(data.get_feature(return_type="numpy",
                                            split_name=self.ref_split,
                                            channel=self.channels[0],
                                            channel_type=self.channel_types[0] or "X"),
                           dtype=np.float64)
        x_inf = np.asarray(data.get_feature(return_type="numpy",
                                            split_name=self.inf_split,
                                            channel=self.channels[1],
                                            channel_type=self.channel_types[1] or "X"),
                           dtype=np.float64)
        data.data.obsp[self.out] = compute_dstg_adj(x_ref, x_inf, k_filter=self.k_filter,
                                                    num_cc=self.num_cc)
        return data


# --------------------------------------------------------------------------
# reference-named functional surface (parity: dstg_graph.py:88-174). These
# operate on genes×spots DataFrames like the reference; the class above uses
# the vectorized device path (compute_dstg_adj).
# --------------------------------------------------------------------------

def query_knn(data, k, query=None):
    """(dist, ind) kNN via a host KD-tree (parity: dstg_graph.py:124)."""
    from scipy.spatial import cKDTree
    tree = cKDTree(np.asarray(data))
    dist, ind = tree.query(np.asarray(data if query is None else query), k)
    if k == 1:
        dist, ind = dist[:, None], ind[:, None]
    return dist, ind


def knn(cell_embedding, spots1, spots2, k):
    """Four-way kNN bundle between two spot sets (parity: dstg_graph.py:130)."""
    emb1 = cell_embedding.loc[spots1]
    emb2 = cell_embedding.loc[spots2]
    nnaa = query_knn(emb1, k=k + 1)
    nnbb = query_knn(emb2, k=k + 1)
    nnab = query_knn(data=emb2, k=k, query=emb1)
    nnba = query_knn(data=emb1, k=k, query=emb2)
    return nnaa, nnab, nnba, nnbb, spots1, spots2


def mnn(neighbors, colnames, num):
    """Mutual nearest-neighbor pairs from a knn() bundle (dstg_graph.py:144).

    A pair (c, j) is kept when j is among c's top-5 cross neighbors AND c
    appears among j's top-5 reverse neighbors; like the reference, a pair is
    emitted once per matching reverse slot. Vectorized over all pairs."""
    import pandas as pd
    ab = np.asarray(neighbors[1][1])[:, :5]  # (n1, 5) set1 -> set2
    ba = np.asarray(neighbors[2][1])[:, :5]  # (n2, 5) set2 -> set1
    present = np.in1d(np.arange(ab.shape[0]),
                      [list(np.asarray(neighbors[4])).index(s)
                       for s in colnames
                       if (np.asarray(neighbors[4]) == s).any()])
    cells = np.repeat(np.arange(ab.shape[0]), ab.shape[1])
    cands = ab.ravel()
    # multiplicity = how many of the candidate's reverse slots point back
    counts = (ba[cands] == cells[:, None]).sum(1) * present[cells]
    keep = np.repeat(np.arange(len(cands)), counts)
    mnns = pd.DataFrame(np.column_stack((cells[keep], cands[keep])))
    mnns.columns = ["spot1", "spot2"]
    return mnns


def filter_edge(edges, neighbors, mats, features, k_filter):
    """Keep MNN edges confirmed by kNN over selected genes (dstg_graph.py:108)."""
    from dance_tpu.transforms.preprocess import l2norm
    nn_spots1, nn_spots2 = neighbors[4:6]
    mat1 = mats.loc[features, nn_spots1].T
    mat2 = mats.loc[features, nn_spots2].T
    cn_data1 = l2norm(mat1)
    cn_data2 = l2norm(mat2)
    nn = query_knn(data=cn_data2.loc[nn_spots2], k=k_filter,
                   query=cn_data1.loc[nn_spots1])
    i = edges["spot1"].to_numpy().astype(int)
    j = edges["spot2"].to_numpy().astype(int)
    ind = (nn[1][i] == j[:, None]).any(1)
    return edges[ind].copy().reset_index(drop=True)


def construct_link_graph(pseudo_st_df, real_st_df, k_filter=200, num_cc=30):
    """CCA -> MNN -> gene-confirmed edge list (parity: dstg_graph.py:88)."""
    import pandas as pd

    from dance_tpu.transforms.preprocess import ccaEmbed, l2norm, selectTopGenes
    cell_embedding, loading = ccaEmbed(pseudo_st_df, real_st_df, num_cc=num_cc)
    norm_embedding = l2norm(mat=cell_embedding[0])
    spots1 = pseudo_st_df.columns
    spots2 = real_st_df.columns
    neighbor = knn(cell_embedding=norm_embedding, spots1=spots1, spots2=spots2,
                   k=30)
    mnn_edges = mnn(neighbors=neighbor, colnames=cell_embedding[0].index, num=5)
    select_genes = selectTopGenes(Loadings=loading, dims=range(num_cc),
                                  DimGenes=100, maxGenes=200)
    mat = pd.concat((pseudo_st_df, real_st_df), axis=1)
    return filter_edge(edges=mnn_edges, neighbors=neighbor, mats=mat,
                       features=select_genes, k_filter=k_filter)


def preprocess_adj(adj):
    """Symmetric normalization with identity (parity: dstg_graph.py:117)."""
    adj = sp.csr_matrix(adj + sp.eye(adj.shape[0]))
    d_inv_sqrt = sp.diags(1.0 / np.sqrt(np.asarray(adj.sum(1)).ravel()))
    return d_inv_sqrt.dot(adj).dot(d_inv_sqrt).tocoo()

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

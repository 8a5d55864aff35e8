"""Misc preprocessing utilities (parity: dance/transforms/preprocess.py subset).

Carries the non-class utilities the multimodal datasets and scMoGNN use:
tf-idf / LSI transformers, the MaskedArray imputation helper, and static-shape
subgraph samplers replacing the GraphSaint samplers (preprocess.py:179-288).
"""

import numpy as np
import pandas as pd
import scipy.sparse as sp
from scipy.stats import expon

from dance_tpu.settings import logger


class tfidfTransformer:
    """TF-IDF with fit/transform surface (parity: preprocess.py:147)."""

    def __init__(self):
        self.idf = None
        self.fitted = False

    def fit(self, X):
        self.idf = np.asarray(X.shape[0] / X.sum(axis=0)).ravel()
        self.fitted = True

    def transform(self, X):
        if not self.fitted:
            raise RuntimeError("Transformer was not fitted on any data")
        if sp.issparse(X):
            tf = X.multiply(1 / X.sum(axis=1))
            return sp.csr_matrix(tf.multiply(self.idf[None, :]))
        tf = X / X.sum(axis=1, keepdims=True)
        return tf * self.idf[None, :]

    def fit_transform(self, X):
        self.fit(X)
        return self.transform(X)


class lsiTransformer:
    """LSI: tf-idf -> l1-normalize -> log1p(1e4 x) -> truncated SVD
    (parity: preprocess.py:107)."""

    def __init__(self, n_components: int = 20, drop_first: bool = True):
        self.drop_first = drop_first
        self.n_components = n_components + drop_first
        self.tfidf = tfidfTransformer()
        self.fitted = False
        self._components = None

    def _normalize(self, X):
        X = sp.csr_matrix(X) if sp.issparse(X) else np.asarray(X)
        if sp.issparse(X):
            sums = np.abs(X).sum(axis=1)
            X = sp.csr_matrix(X.multiply(1.0 / np.maximum(sums, 1e-12)))
            return np.log1p(np.asarray(X.todense()) * 1e4)
        sums = np.abs(X).sum(axis=1, keepdims=True)
        return np.log1p(X / np.maximum(sums, 1e-12) * 1e4)

    def fit(self, adata):
        from dance_tpu.ops.linalg import randomized_svd
        X = self.tfidf.fit_transform(adata.layers["counts"])
        X_norm = self._normalize(X)
        _, s, vt = randomized_svd(X_norm.astype(np.float32), self.n_components, seed=777)
        self._components = np.asarray(vt)
        self.fitted = True

    def transform(self, adata):
        if not self.fitted:
            raise RuntimeError("Transformer was not fitted on any data")
        X = self.tfidf.transform(adata.layers["counts"])
        X_norm = self._normalize(X)
        X_lsi = X_norm @ self._components.T
        return pd.DataFrame(X_lsi, index=adata.obs_names).iloc[:, int(self.drop_first):]

    def fit_transform(self, adata):
        self.fit(adata)
        return self.transform(adata)


class MaskedArray:
    """Binary-masked matrix helper for imputation eval (parity: preprocess.py:548)."""

    def __init__(self, data=None, mask=None, distr: str = "exp", dropout: float = 0.01,
                 seed: int = 1):
        self.data = np.array(data)
        self._binMask = np.array(mask) if mask is not None else np.ones_like(
            self.data, dtype=bool)
        self.shape = self.data.shape
        self.distr = distr
        self.dropout = dropout
        self.seed = seed

    @property
    def binMask(self):
        return self._binMask

    @binMask.setter
    def binMask(self, value):
        self._binMask = value.astype(bool)

    def getMaskedMatrix(self):
        out = self.data.copy()
        out[~self.binMask] = 0
        return out

    def getMasked_flat(self):
        return self.data[~self.binMask]

    def copy(self):
        return MaskedArray(data=self.data.copy(), mask=self.binMask.copy(),
                           distr=self.distr, dropout=self.dropout, seed=self.seed)

    def get_probs(self, vec):
        return {"exp": expon.pdf(vec, 0, 20),
                "uniform": np.tile([1.0 / len(vec)], len(vec))}.get(self.distr)

    def get_Nmasked(self, idx):
        col = self.data[:, idx]
        dp_i = (1 + (col == 0).sum()) / self.shape[0]
        dp_f = np.exp(-2 * np.log10(max(col.mean(), 1e-12)) ** 2)
        return 1 + int((col == 0).sum() * dp_f / dp_i)

    def generate(self):
        """Mask ``dropout`` fraction of entries, exp/uniform-weighted by value."""
        rng = np.random.default_rng(self.seed)
        self._binMask = np.ones(self.shape, dtype=bool)
        for g in range(self.shape[1]):
            col = self.data[:, g]
            pos = np.nonzero(col)[0]
            if len(pos) < 2:
                continue
            n_mask = min(int(np.floor(self.dropout * len(pos))), len(pos) - 1)
            if n_mask == 0:
                continue
            probs = self.get_probs(col[pos])
            probs = probs / probs.sum()
            chosen = rng.choice(len(pos), n_mask, p=probs, replace=False)
            self._binMask[pos[chosen], g] = False


class SubgraphSampler:
    """Static-shape node-induced subgraph sampler (GraphSaint replacement).

    The reference uses GraphSaint random-node/random-walk samplers returning
    dynamic DGL subgraphs (preprocess.py:179-288). For XLA, every sampled
    batch must have identical shapes, so this sampler draws a *fixed-size*
    node set and returns the padded induced CSR block plus the node ids —
    directly consumable by the device GNN layers.
    """

    def __init__(self, adj: sp.spmatrix, num_nodes_per_batch: int, seed: int = 0):
        self.adj = sp.csr_matrix(adj)
        self.num_nodes_per_batch = int(min(num_nodes_per_batch, self.adj.shape[0]))
        self.rng = np.random.default_rng(seed)

    def sample(self):
        n = self.adj.shape[0]
        nodes = np.sort(self.rng.choice(n, self.num_nodes_per_batch, replace=False))
        sub = self.adj[nodes][:, nodes]
        return nodes, sub


class SAINTSampler(SubgraphSampler):
    """Random-node SAINT sampler name alias (parity surface: preprocess.py:179)."""


class SAINTRandomWalkSampler(SubgraphSampler):
    """Random-walk-rooted sampler with fixed output size (parity: preprocess.py:288)."""

    def __init__(self, adj, num_roots: int, walk_length: int, seed: int = 0):
        super().__init__(adj, num_roots * (walk_length + 1), seed)
        self.num_roots = num_roots
        self.walk_length = walk_length

    def sample(self):
        n = self.adj.shape[0]
        roots = self.rng.choice(n, self.num_roots, replace=False)
        nodes = set(roots.tolist())
        frontier = roots
        for _ in range(self.walk_length):
            nxt = []
            for u in frontier:
                nbrs = self.adj.indices[self.adj.indptr[u]:self.adj.indptr[u + 1]]
                nxt.append(self.rng.choice(nbrs) if len(nbrs) else u)
            frontier = np.asarray(nxt)
            nodes.update(frontier.tolist())
        # pad/trim to the static size with random extra nodes
        target = self.num_nodes_per_batch
        nodes = list(nodes)
        if len(nodes) < target:
            # pad from the complement so the node set stays duplicate-free
            # (duplicate ids would double-count rows in message passing)
            pool = np.setdiff1d(np.arange(n), np.asarray(nodes, dtype=np.int64))
            n_pad = min(target - len(nodes), len(pool))
            nodes.extend(self.rng.choice(pool, n_pad, replace=False).tolist())
        nodes = np.sort(np.asarray(nodes[:target]))
        return nodes, self.adj[nodes][:, nodes]


def generate_random_pair(y, label_cell_indx, num, error_rate=0):
    """Random must-link / cannot-link pairwise constraints from labels
    (parity: dance/transforms/preprocess.py:382): same-label pairs become
    must-links and different-label pairs cannot-links, with the first
    ``error_rate * num`` draws deliberately flipped to simulate noisy
    supervision. Returns (ml_ind1, ml_ind2, cl_ind1, cl_ind2, error_num)."""
    import random as _random

    y = np.asarray(y)
    label_cell_indx = list(label_cell_indx)
    ml_ind1, ml_ind2, cl_ind1, cl_ind2 = [], [], [], []
    seen_ml = set()
    error_num = 0
    num0 = num
    while num > 0:
        tmp1 = _random.choice(label_cell_indx)
        tmp2 = _random.choice(label_cell_indx)
        if tmp1 == tmp2 or (tmp1, tmp2) in seen_ml:
            continue
        flip = error_num < error_rate * num0
        if (y[tmp1] == y[tmp2]) != flip:  # true pair kept, or flipped link
            ml_ind1.append(tmp1)
            ml_ind2.append(tmp2)
            seen_ml.add((tmp1, tmp2))
        else:
            cl_ind1.append(tmp1)
            cl_ind2.append(tmp2)
        if flip:
            error_num += 1
        num -= 1
    ml_ind1, ml_ind2 = np.array(ml_ind1, int), np.array(ml_ind2, int)
    cl_ind1, cl_ind2 = np.array(cl_ind1, int), np.array(cl_ind2, int)
    ml_perm = np.random.permutation(len(ml_ind1))
    cl_perm = np.random.permutation(len(cl_ind1))
    return (ml_ind1[ml_perm], ml_ind2[ml_perm], cl_ind1[cl_perm],
            cl_ind2[cl_perm], error_num)

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


# --------------------------------------------------------------------------
# legacy public utilities (parity: dance/transforms/preprocess.py:35-545)
# --------------------------------------------------------------------------

def prefilter_cells(adata, min_counts=None, max_counts=None, min_genes=200,
                    max_genes=None):
    """Combined cell filter + raw log1p snapshot (parity: preprocess.py:35).

    Unlike scanpy's one-criterion-per-call filter, every given threshold is
    ANDed into one mask before subsetting; ``adata.raw`` is set to a
    log1p-transformed snapshot afterwards, as the reference does."""
    from dance_tpu import sc as _sc
    from dance_tpu.data.container import Raw
    if min_genes is None and min_counts is None and max_genes is None \
            and max_counts is None:
        raise ValueError("Provide one of min_counts, min_genes, max_counts "
                         "or max_genes.")
    mask = np.ones(adata.shape[0], dtype=bool)
    for kw in ("min_genes", "max_genes", "min_counts", "max_counts"):
        val = locals()[kw]
        if val is not None:
            mask &= _sc.pp.filter_cells(adata, **{kw: val}, inplace=False)[0]
    adata._inplace_subset_obs(mask)
    tmp = adata.copy()
    _sc.pp.log1p(tmp)
    adata.raw = Raw(tmp)


def prefilter_genes(adata, min_counts=None, max_counts=None, min_cells=10,
                    max_cells=None):
    """Combined gene filter (parity: preprocess.py:52)."""
    from dance_tpu import sc as _sc
    if min_cells is None and min_counts is None and max_cells is None \
            and max_counts is None:
        raise ValueError("Provide one of min_counts, min_genes, max_counts "
                         "or max_genes.")
    mask = np.ones(adata.shape[1], dtype=bool)
    for kw in ("min_cells", "max_cells", "min_counts", "max_counts"):
        val = locals()[kw]
        if val is not None:
            mask &= _sc.pp.filter_genes(adata, **{kw: val}, inplace=False)[0]
    adata._inplace_subset_var(mask)


def prefilter_specialgenes(adata, Gene1Pattern="ERCC", Gene2Pattern="MT-"):
    """Drop spike-in/mitochondrial genes by name prefix (preprocess.py:67)."""
    keep = np.array([not (str(n).startswith(Gene1Pattern)
                          or str(n).startswith(Gene2Pattern))
                     for n in adata.var_names], dtype=bool)
    adata._inplace_subset_var(keep)


def l2norm(mat):
    """Row L2-normalization of a DataFrame/array (parity: preprocess.py:309);
    rows with zero norm become zero instead of inf."""
    arr = mat.to_numpy() if hasattr(mat, "to_numpy") else np.asarray(mat)
    stat = np.sqrt((arr ** 2).sum(1))
    out = np.divide(arr, stat[:, None], out=np.zeros_like(arr, dtype=float),
                    where=stat[:, None] != 0)
    if hasattr(mat, "to_numpy"):
        mat[mat.columns] = out
        return mat
    return out


def SVD(mat, num_cc):
    """Leading num_cc singular triplets, reference layout (preprocess.py:535):
    returns (u, v, d) with v already transposed to (n, num_cc)."""
    u, s, vt = np.linalg.svd(np.asarray(mat, dtype=np.float64),
                             full_matrices=False)
    k = int(num_cc)
    return u[:, :k], vt[:k, :].T, s[:k]


def ccaEmbed(data1, data2, num_cc: int = 30):
    """CCA embedding of two genes×cells DataFrames (parity: preprocess.py:317).

    Returns ``([embeds_data, d], loadings)`` where embeds_data stacks both
    sets' cell embeddings (sign-fixed so the first row of each component is
    non-negative) and loadings are the shared-gene loadings."""
    from sklearn.preprocessing import scale as _scale
    object1 = _scale(data1)
    object2 = _scale(data2)
    u, v, d = SVD(object1.T @ object2, int(num_cc))
    embeds_data = np.concatenate((u, v))
    flip = embeds_data[0] < 0
    embeds_data[:, flip] *= -1
    embeds_data = pd.DataFrame(
        embeds_data,
        index=np.concatenate((np.array(data1.columns), np.array(data2.columns))),
        columns=[f"D_{i}" for i in range(int(num_cc))])
    combined = data1.merge(data2, left_index=True, right_index=True,
                           how="inner").dropna()
    loadings = pd.DataFrame(combined.to_numpy() @ embeds_data.to_numpy(),
                            index=combined.index)
    return [embeds_data, d], loadings


def sortGenes(Loadings, dim, numG):
    """Top ±numG/2 genes by loading on one component (preprocess.py:340)."""
    data = Loadings.iloc[:, dim]
    num = int(np.round(numG / 2))
    pos = np.array(data.sort_values(ascending=False).index[:num])
    neg = np.array(data.sort_values(ascending=True).index[:num])
    return np.concatenate((pos, neg))


def selectTopGenes(Loadings, dims, DimGenes, maxGenes):
    """Largest per-dim gene union under the maxGenes cap (preprocess.py:351)."""
    maxG = max(len(dims) * 2, maxGenes)
    gens = []
    for i in range(1, DimGenes + 1):
        selg = []
        for j in dims:
            selg.extend(set(sortGenes(Loadings, dim=j, numG=i)))
        gens.append(set(selg))
    lens = np.array([len(g) for g in gens])
    lens = lens[lens < maxG]
    max_per = int(np.where(lens == lens.max())[0][0]) + 1
    selg = []
    for j in dims:
        selg.extend(set(sortGenes(Loadings, dim=j, numG=max_per)))
    return np.array(list(set(selg)), dtype=object)


def filter_data(data, highly_genes=500):
    """HVG-filter a Data object in place (parity: preprocess.py:371)."""
    from dance_tpu import sc as _sc
    adata = data.data.copy()
    _sc.pp.filter_genes(adata, min_counts=3)
    _sc.pp.filter_cells(adata, min_counts=1)
    _sc.pp.normalize_per_cell(adata)
    _sc.pp.log1p(adata)
    _sc.pp.highly_variable_genes(adata, min_mean=0.0125, max_mean=4,
                                 flavor="cell_ranger", min_disp=0.5,
                                 n_top_genes=highly_genes, subset=True)
    data._data = data.data[adata.obs_names, adata.var_names]


def geneSelection(data, threshold=0, atleast=10, yoffset=.02, xoffset=5,
                  decay=1.5, n=None, verbose=1):
    """scGNN's dropout-curve gene selection (parity: preprocess.py:430).

    Selects genes whose zero-rate exceeds an exponential-decay curve of mean
    log2 expression; with ``n`` set, bisects the x-offset until exactly n
    genes are selected."""
    if sp.issparse(data):
        zero_rate = 1 - np.squeeze(np.asarray((data > threshold).mean(axis=0)))
        A = data.multiply(data > threshold)
        A.data = np.log2(A.data)
        mean_expr = np.full_like(zero_rate, np.nan)
        detected = zero_rate < 1
        mean_expr[detected] = (np.squeeze(np.asarray(A[:, detected].mean(axis=0)))
                               / (1 - zero_rate[detected]))
    else:
        data = np.asarray(data)
        zero_rate = 1 - (data > threshold).mean(axis=0)
        mean_expr = np.full_like(zero_rate, np.nan)
        detected = zero_rate < 1
        mask = data[:, detected] > threshold
        logs = np.full_like(data[:, detected], np.nan, dtype=float)
        logs[mask] = np.log2(data[:, detected][mask])
        mean_expr[detected] = np.nanmean(logs, axis=0)

    detected_counts = (np.squeeze(np.asarray((data > threshold).sum(axis=0)))
                       if sp.issparse(data)
                       else (np.asarray(data) > threshold).sum(axis=0))
    low_detection = detected_counts < atleast
    zero_rate[low_detection] = np.nan
    mean_expr[low_detection] = np.nan

    nonan = ~np.isnan(zero_rate)

    def select(xoff):
        sel = np.zeros_like(zero_rate, dtype=bool)
        sel[nonan] = zero_rate[nonan] > (np.exp(-decay * (mean_expr[nonan]
                                                          - xoff)) + yoffset)
        return sel

    if n is not None:
        up, low = 10, 0
        for _ in range(100):
            selected = select(xoffset)
            if selected.sum() == n:
                break
            if selected.sum() < n:
                up = xoffset
                xoffset = (xoffset + low) / 2
            else:
                low = xoffset
                xoffset = (xoffset + up) / 2
        if verbose > 0:
            logger.info("Chosen offset: %.2f", xoffset)
    else:
        selected = select(xoffset)
    return selected


def normalize_adata(data, filter_min_counts=True, size_factors=True,
                    normalize_input=True, logtrans_input=True):
    """ZINB-AE-family normalization recipe on a Data object (preprocess.py:493)."""
    from dance_tpu import sc as _sc
    from dance_tpu.data.container import Raw
    if filter_min_counts:
        _sc.pp.filter_genes(data.data, min_counts=1)
        _sc.pp.filter_cells(data.data, min_counts=1)
    data.data.raw = Raw(data.data.copy() if (size_factors or normalize_input
                                             or logtrans_input) else data.data)
    if size_factors:
        _sc.pp.normalize_per_cell(data.data)
        data.data.obs["size_factors"] = (data.data.obs.n_counts
                                         / np.median(data.data.obs.n_counts))
    else:
        data.data.obs["size_factors"] = 1.0
    if logtrans_input:
        _sc.pp.log1p(data.data)
    if normalize_input:
        _sc.pp.scale(data.data)


def row_normalize(mx):
    """Row-normalize a scipy sparse matrix (parity: preprocess.py:516)."""
    rowsum = np.asarray(mx.sum(1)).ravel()
    with np.errstate(divide="ignore"):
        r_inv = np.power(rowsum, -1.0)
    r_inv[np.isinf(r_inv)] = 0.0
    return sp.diags(r_inv).dot(mx)


def sparse_mx_to_torch_sparse_tensor(sparse_mx):
    """scipy sparse -> torch sparse COO tensor (parity: preprocess.py:528) —
    a torch-interop shim for callers bridging to the reference stack."""
    import torch
    sparse_mx = sparse_mx.tocoo().astype(np.float32)
    indices = torch.from_numpy(
        np.vstack((sparse_mx.row, sparse_mx.col)).astype(np.int64))
    values = torch.from_numpy(sparse_mx.data)
    return torch.sparse_coo_tensor(indices, values, tuple(sparse_mx.shape))


def load_graph(path, data):
    """Load an edge-list file into a row-normalized symmetric adjacency with
    self loops (parity: preprocess.py:493 load_graph, used by scDSC).
    Returns the framework's device CSR instead of a torch sparse tensor."""
    from dance_tpu.ops.sparse import csr_from_scipy
    n = data.shape[0]
    edges = np.genfromtxt(path, dtype=np.int32)
    adj = sp.coo_matrix((np.ones(edges.shape[0]),
                         (edges[:, 0], edges[:, 1])), shape=(n, n),
                        dtype=np.float32)
    adj = adj + adj.T.multiply(adj.T > adj) - adj.multiply(adj.T > adj)
    adj = sp.csr_matrix(adj) + sp.eye(adj.shape[0], format="csr")
    return csr_from_scipy(sp.csr_matrix(row_normalize(adj), dtype=np.float32))


def calculate_log_library_size(Dataset):
    """Per-dataset log-library mean/var columns (parity: preprocess.py:89);
    raises on zero-read cells like the reference."""
    t = np.asarray(np.asarray(Dataset).sum(axis=1)).astype(np.float64).ravel()
    zero_idx = np.where(t == 0)[0]
    if zero_idx.any():
        raise ValueError(
            f"Cells with zero reads encountered (index up to first ten): "
            f"{zero_idx[:10]}\nPlease perform necessary filtering to remove "
            "trivial cells to suppress this error.")
    lib_size = np.log(t)
    n = len(t)
    return (np.full((n, 1), np.mean(lib_size)),
            np.full((n, 1), np.var(lib_size)))

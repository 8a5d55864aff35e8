"""Native C++ graph kernels vs scipy/numpy references."""

import numpy as np
import pytest
import scipy.sparse as sp


def test_native_builds():
    from dance_tpu.native import get_lib
    assert get_lib() is not None, "native library failed to build"


def test_neighbor_sample():
    from dance_tpu.native import neighbor_sample
    adj = sp.random(100, 100, density=0.1, random_state=0, format="csr",
                    dtype=np.float32)
    seeds = np.arange(50, dtype=np.int32)
    idx, w = neighbor_sample(adj.indptr, adj.indices, seeds, 8, weights=adj.data,
                             seed=1)
    assert idx.shape == (50, 8) and w.shape == (50, 8)
    # every sampled neighbor must be a true neighbor (or self for deg-0 nodes)
    for i, u in enumerate(seeds):
        nbrs = set(adj.indices[adj.indptr[u]:adj.indptr[u + 1]])
        deg = len(nbrs)
        if deg == 0:
            assert (idx[i] == u).all() and (w[i] == 0).all()
        else:
            assert set(idx[i]).issubset(nbrs)
            if deg > 8:  # without replacement: all distinct
                assert len(set(idx[i])) == 8


def test_build_bipartite_csr():
    from dance_tpu.native import build_bipartite_csr
    rng = np.random.default_rng(0)
    x = sp.random(30, 20, density=0.2, random_state=0, format="coo", dtype=np.float32)
    adj = build_bipartite_csr(x.row, x.col, x.data, 30, 20, add_self_loops=True)
    # reference construction
    n = 50
    src = np.concatenate([x.row + 20, x.col])
    dst = np.concatenate([x.col, x.row + 20])
    w = np.concatenate([x.data, x.data])
    ref = sp.csr_matrix((w, (dst, src)), shape=(n, n)) + sp.eye(n, format="csr",
                                                                dtype=np.float32)
    np.testing.assert_allclose(adj.toarray(), ref.toarray(), rtol=1e-6)


def test_csr_subgraph_native():
    from dance_tpu.native import get_lib
    lib = get_lib()
    if lib is None:
        pytest.skip("native lib unavailable")
    import ctypes
    adj = sp.random(40, 40, density=0.15, random_state=1, format="csr",
                    dtype=np.float32)
    keep = np.array(sorted(np.random.default_rng(0).choice(40, 15, replace=False)),
                    dtype=np.int32)
    out_indptr = np.empty(len(keep) + 1, np.int64)
    out_indices = np.empty(adj.nnz, np.int32)
    out_weights = np.empty(adj.nnz, np.float32)
    nnz = lib.csr_subgraph(adj.indptr.astype(np.int64), adj.indices.astype(np.int32),
                           adj.data.ctypes.data_as(ctypes.c_void_p), 40, keep,
                           len(keep), out_indptr, out_indices, out_weights)
    sub = sp.csr_matrix((out_weights[:nnz], out_indices[:nnz], out_indptr),
                        shape=(len(keep), len(keep)))
    ref = adj[keep][:, keep]
    np.testing.assert_allclose(sub.toarray(), ref.toarray(), rtol=1e-6)


def test_neighbor_sampler_blocks():
    from dance_tpu.native import NeighborSampler
    adj = sp.random(200, 200, density=0.05, random_state=0, format="csr",
                    dtype=np.float32)
    sampler = NeighborSampler(adj, fanout=10, batch_size=64, seed=0)
    blocks = list(sampler(np.arange(200)))
    assert len(blocks) == 4  # ceil(200/64) with wrap-padding
    for seeds, idx, w in blocks:
        assert seeds.shape == (64,)
        assert idx.shape == (64, 10)
        assert w.shape == (64, 10)


def test_scdeepsort_sampled_fit():
    """Native-sampler minibatch path learns on synthetic data."""
    import numpy as np

    from dance_tpu.datasets.synthetic import annotation_data
    from dance_tpu.modules.single_modality.cell_type_annotation import ScDeepSort
    d = annotation_data(n_cells=200, n_genes=80, n_types=3, seed=0)
    model = ScDeepSort(dim_in=16, dim_hid=32, num_layers=1, seed=0, batch_size=64)
    model.preprocess(d, n_components=16)
    graph = d.data.uns["PCACellFeatureGraph"]
    y = d.data.obsm["cell_type"].to_numpy().argmax(1)
    model.fit_with_sampling(graph, y, epochs=30, fanout=8)
    pred = model.predict_sampled(graph)
    acc = (pred == y).mean()
    assert acc > 0.7, f"sampled-fit acc too low: {acc}"

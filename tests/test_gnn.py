"""GNN layer + kernel tests: segment ops vs scipy, Pallas BSR SpMM vs dense."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

rng = np.random.default_rng(0)


@pytest.fixture
def graph():
    adj = sp.random(50, 50, density=0.1, random_state=0, format="csr", dtype=np.float32)
    adj = adj + sp.eye(50, dtype=np.float32, format="csr")
    h = rng.random((50, 16)).astype(np.float32)
    return adj, h


def test_spmm_parity(graph):
    from dance_tpu.ops.segment import spmm
    from dance_tpu.ops.sparse import csr_from_scipy
    adj, h = graph
    out = spmm(csr_from_scipy(adj), h)
    np.testing.assert_allclose(out, adj @ h, rtol=1e-4, atol=1e-5)


def test_spmm_mean(graph):
    from dance_tpu.ops.segment import spmm
    from dance_tpu.ops.sparse import csr_from_scipy
    adj, h = graph
    out = spmm(csr_from_scipy(adj), h, weighted=False, op="mean")
    deg = np.diff(adj.indptr)
    ref = (adj > 0).astype(np.float32) @ h / np.maximum(deg, 1)[:, None]
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_edge_softmax(graph):
    from dance_tpu.ops.segment import edge_softmax
    from dance_tpu.ops.sparse import csr_from_scipy
    adj, _ = graph
    aj = csr_from_scipy(adj)
    logits = rng.random(aj.nnz).astype(np.float32)
    att = np.asarray(edge_softmax(aj, logits))
    # per-row sums == 1
    rows = np.asarray(aj.row_ids())
    for r in range(50):
        mask = rows == r
        if mask.any():
            assert abs(att[mask].sum() - 1) < 1e-5


def test_pallas_bsr_spmm(graph):
    from dance_tpu.ops.pallas_kernels import pallas_spmm
    adj, h = graph
    out = pallas_spmm(adj, h, interpret=True)
    np.testing.assert_allclose(out, adj @ h, rtol=1e-4, atol=1e-4)


def test_pallas_bsr_spmm_multi_block():
    from dance_tpu.ops.pallas_kernels import pallas_spmm
    adj = sp.random(300, 200, density=0.05, random_state=1, format="csr",
                    dtype=np.float32)
    # ensure every row-tile has a block (diagonal-ish entries)
    adj = adj + sp.csr_matrix((np.ones(200, np.float32),
                               (np.arange(200), np.arange(200))), shape=(300, 200))
    h = rng.random((200, 140)).astype(np.float32)
    out = pallas_spmm(adj, h, interpret=True)
    np.testing.assert_allclose(out, adj @ h, rtol=1e-4, atol=1e-4)


def test_pallas_bsr_spmm_bf16():
    """bf16-streamed SpMM: f32-accumulated forward within bf16 tolerance and
    a differentiable backward matching the f32 path."""
    from dance_tpu.ops.pallas_kernels import bsr_from_scipy, bsr_spmm_ad
    adj = sp.random(300, 200, density=0.05, random_state=2, format="csr",
                    dtype=np.float32)
    adj = adj + sp.csr_matrix((np.ones(200, np.float32),
                               (np.arange(200), np.arange(200))), shape=(300, 200))
    h = rng.random((200, 96)).astype(np.float32)
    bsr = bsr_from_scipy(adj)
    hp = jnp.pad(jnp.asarray(h), ((0, bsr.shape[1] - 200), (0, 0)))

    out = bsr_spmm_ad(bsr, hp, interpret=True, compute_dtype=jnp.bfloat16)
    assert out.dtype == jnp.float32
    np.testing.assert_allclose(out[:300], adj @ h, rtol=2e-2, atol=2e-2)

    def loss(fn_dtype):
        def f(blocks, b):
            from dance_tpu.ops.pallas_kernels import BSRMatrix
            m = BSRMatrix(blocks, bsr.block_rows, bsr.block_cols, bsr.shape)
            return jnp.sum(bsr_spmm_ad(m, b, interpret=True,
                                       compute_dtype=fn_dtype) ** 2)
        return jax.grad(f, argnums=(0, 1))(bsr.blocks, hp)

    g16 = loss(jnp.bfloat16)
    g32 = loss(None)
    for a, b in zip(g16, g32):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-2,
                                   atol=5e-1)


def test_pallas_bsr_sddmm():
    """Pallas SDDMM (dA term of the SpMM backward) vs the einsum reference."""
    from dance_tpu.ops.pallas_kernels import BLOCK, bsr_from_scipy, bsr_sddmm
    adj = sp.random(300, 200, density=0.05, random_state=3, format="csr",
                    dtype=np.float32)
    adj = adj + sp.csr_matrix((np.ones(200, np.float32),
                               (np.arange(200), np.arange(200))), shape=(300, 200))
    bsr = bsr_from_scipy(adj)
    n_rows, n_cols = bsr.shape
    g = rng.random((n_rows, 96)).astype(np.float32)
    b = rng.random((n_cols, 96)).astype(np.float32)
    out = bsr_sddmm(bsr.block_rows, bsr.block_cols, jnp.asarray(g),
                    jnp.asarray(b), interpret=True)
    g3 = g.reshape(n_rows // BLOCK, BLOCK, -1)
    b3 = b.reshape(n_cols // BLOCK, BLOCK, -1)
    ref = np.einsum("kbd,kcd->kbc", g3[np.asarray(bsr.block_rows)],
                    b3[np.asarray(bsr.block_cols)])
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)
    out16 = bsr_sddmm(bsr.block_rows, bsr.block_cols, jnp.asarray(g),
                      jnp.asarray(b), interpret=True,
                      compute_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(out16), ref, rtol=3e-2, atol=3e-1)


def test_gnn_layers(graph):
    import jax

    from dance_tpu.nn.gnn import (AdaptiveSAGE, GATConv, GCNConv, SAGEConv, TAGConv,
                                  WeightedGraphConv)
    from dance_tpu.ops.sparse import csr_from_scipy
    adj, h = graph
    aj = csr_from_scipy(adj)
    key = jax.random.key(0)
    for layer in [GCNConv(8), WeightedGraphConv(8), SAGEConv(8), TAGConv(8, k=2),
                  GATConv(4, num_heads=2)]:
        params = layer.init(key, aj, h)
        out = layer.apply(params, aj, h)
        assert out.shape == (50, 8), f"{layer.__class__.__name__}: {out.shape}"
        assert np.isfinite(out).all()

    # AdaptiveSAGE needs gene ids + alpha
    gene_id = np.concatenate([np.arange(20), -np.ones(30)]).astype(np.int32)
    alpha = np.ones(22, dtype=np.float32)
    layer = AdaptiveSAGE(8)
    params = layer.init(key, aj, h, gene_id, alpha)
    out = layer.apply(params, aj, h, gene_id, alpha)
    assert out.shape == (50, 8)
    assert np.isfinite(out).all()


def test_spmm_bsr_path(graph):
    """GNN layers accept BSR adjacency for the Pallas fast path."""
    import jax

    from dance_tpu.graph import Graph
    from dance_tpu.nn.gnn import GCNConv, TAGConv
    from dance_tpu.ops.segment import spmm
    adj, h = graph
    g = Graph(adj)
    bsr = g.to_bsr()
    csr = g.to_device().adj
    np.testing.assert_allclose(np.asarray(spmm(bsr, h)), np.asarray(spmm(csr, h)),
                               rtol=1e-4, atol=1e-4)
    key = jax.random.key(0)
    layer = GCNConv(8)
    params = layer.init(key, csr, h)
    out_csr = layer.apply(params, csr, h)
    out_bsr = layer.apply(params, bsr, h)
    np.testing.assert_allclose(np.asarray(out_bsr), np.asarray(out_csr), rtol=1e-3,
                               atol=1e-3)
    with pytest.raises(ValueError):
        spmm(bsr, h, op="mean")


def test_bsr_spmm_grad():
    """bsr_spmm_ad gradients match dense autodiff (both dB and dA-blocks)."""
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp

    from dance_tpu.ops.pallas_kernels import BSRMatrix, bsr_from_scipy, bsr_spmm_ad
    rng = np.random.default_rng(0)
    n = 256
    dense = (rng.random((n, n)) < 0.05).astype(np.float32) * rng.random((n, n))
    dense += np.eye(n, dtype=np.float32)  # self-loops: every row/col covered
    bsr = bsr_from_scipy(sp.csr_matrix(dense))
    b = jnp.asarray(rng.standard_normal((n, 64)), jnp.float32)

    def f_bsr(blocks, b):
        m = BSRMatrix(blocks, bsr.block_rows, bsr.block_cols, bsr.shape)
        return jnp.sum(jnp.tanh(bsr_spmm_ad(m, b, interpret=True)[:n]))

    def f_dense(blocks, b):
        # reconstruct the dense matrix from tiles for the reference gradient
        a = jnp.zeros(bsr.shape)
        br, bc = np.asarray(bsr.block_rows), np.asarray(bsr.block_cols)
        for k in range(bsr.nb):
            a = a.at[br[k] * 128:(br[k] + 1) * 128,
                     bc[k] * 128:(bc[k] + 1) * 128].set(blocks[k])
        return jnp.sum(jnp.tanh((a[:n, :n] @ b)))

    g_bsr = jax.grad(f_bsr, argnums=(0, 1))(bsr.blocks, b)
    g_ref = jax.grad(f_dense, argnums=(0, 1))(bsr.blocks, b)
    np.testing.assert_allclose(np.asarray(g_bsr[1]), np.asarray(g_ref[1]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_bsr[0]), np.asarray(g_ref[0]),
                               rtol=1e-4, atol=1e-4)


def test_bsr_transpose():
    import jax.numpy as jnp
    import scipy.sparse as sp

    from dance_tpu.ops.pallas_kernels import bsr_spmm, bsr_transpose, bsr_from_scipy
    rng = np.random.default_rng(1)
    dense = (rng.random((300, 200)) < 0.08).astype(np.float32) * rng.random((300, 200))
    bsr = bsr_from_scipy(sp.csr_matrix(dense))
    bt = bsr_transpose(bsr)
    h = jnp.asarray(rng.standard_normal((bt.shape[1], 32)), jnp.float32)
    out = bsr_spmm(bt, h, interpret=True)[:200]
    np.testing.assert_allclose(np.asarray(out), dense.T @ np.asarray(h)[:300],
                               rtol=1e-4, atol=1e-4)


def test_pallas_bsr_spmm_empty_rows():
    """Adjacencies with entirely-empty block-rows return zeros, not garbage."""
    import scipy.sparse as sp

    from dance_tpu.ops.pallas_kernels import pallas_spmm

    rng = np.random.default_rng(3)
    n = 300  # >2 block-rows; leave rows 0..149 empty (block-row 0 fully empty)
    rows = rng.integers(150, n, 500)
    cols = rng.integers(0, n, 500)
    adj = sp.csr_matrix((np.ones(500, np.float32), (rows, cols)), shape=(n, n))
    h = rng.random((n, 16), dtype=np.float32)
    out = pallas_spmm(adj, h, interpret=True)
    np.testing.assert_allclose(np.asarray(out), adj @ h, rtol=1e-5, atol=1e-5)
    assert np.all(np.asarray(out)[:150] == 0.0)


def test_bsr_spmm_mean():
    """BSR mean aggregation (weighted sum / degree) matches the CSR path."""
    import scipy.sparse as sp

    from dance_tpu.ops.pallas_kernels import bsr_from_scipy
    from dance_tpu.ops.segment import spmm
    from dance_tpu.ops.sparse import csr_from_scipy

    rng = np.random.default_rng(0)
    adj = sp.random(200, 200, density=0.05, random_state=0, dtype=np.float32,
                    format="csr")
    adj.setdiag(1.0)
    h = rng.random((200, 8), dtype=np.float32)
    deg = jnp.asarray(np.diff(adj.indptr).astype(np.float32))
    ref = spmm(csr_from_scipy(adj), jnp.asarray(h), op="mean")
    out = spmm(bsr_from_scipy(adj), jnp.asarray(h), op="mean", degrees=deg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)


def test_bsr_spmm_max():
    """BSR masked max aggregation matches the CSR segment_max path, weighted
    and unweighted, including multi-block rows and empty rows (-inf)."""
    import scipy.sparse as sp

    from dance_tpu.ops.pallas_kernels import bsr_from_scipy
    from dance_tpu.ops.segment import spmm
    from dance_tpu.ops.sparse import csr_from_scipy

    rng = np.random.default_rng(3)
    adj = sp.random(300, 200, density=0.04, random_state=3, dtype=np.float32,
                    format="csr")
    adj.data = adj.data - 0.5  # negative weights exercise the -inf masking
    adj.eliminate_zeros()
    h = (rng.random((200, 20), dtype=np.float32) - 0.5)
    csr, bsr = csr_from_scipy(adj), bsr_from_scipy(adj)
    hj = jnp.asarray(h)
    for weighted in (True, False):
        ref = np.asarray(spmm(csr, hj, weighted=weighted, op="max", n_out=300))
        out = np.asarray(spmm(bsr, hj, weighted=weighted, op="max", n_out=300))
        empty = np.diff(adj.indptr) == 0
        assert np.all(np.isneginf(out[empty]))
        np.testing.assert_allclose(out[~empty], ref[~empty], rtol=1e-5,
                                   atol=1e-6)


def _toy_bipartite(seed=0, n_cells=60, n_genes=25, dim=6):
    import scipy.sparse as sp

    from dance_tpu.graph import Graph

    rng = np.random.default_rng(seed)
    expr = sp.random(n_cells, n_genes, density=0.25, random_state=seed,
                     dtype=np.float32, format="csr")
    return Graph.from_cell_feature_matrix(
        expr, rng.random((n_cells, dim), dtype=np.float32),
        rng.random((n_genes, dim), dtype=np.float32)), rng


def test_adaptive_sage_bsr_parity():
    """AdaptiveSAGE through the AdaptiveBSR decomposition == CSR edge gather."""
    from dance_tpu.nn.gnn import AdaptiveSAGE

    g, rng = _toy_bipartite()
    dg = g.to_device()
    abr = g.to_adaptive_bsr()
    gene_id = dg.ndata["cell_id"]
    h = dg.ndata["features"]
    n_genes = int(g.info["num_genes"])
    alpha = jnp.asarray(rng.normal(1.0, 0.3, n_genes + 2).astype(np.float32))

    layer = AdaptiveSAGE(out_dim=8, dropout=0.0)
    params = layer.init(jax.random.key(0), dg.adj, h, gene_id, alpha)["params"]
    out_csr = layer.apply({"params": params}, dg.adj, h, gene_id, alpha)
    out_bsr = layer.apply({"params": params}, abr, h, gene_id, alpha)
    np.testing.assert_allclose(np.asarray(out_bsr), np.asarray(out_csr),
                               rtol=2e-3, atol=2e-3)

    # gradients flow through the BSR path (alpha + dense kernels)
    def loss(alpha_):
        return jnp.sum(layer.apply({"params": params}, abr, h, gene_id, alpha_) ** 2)

    grad = jax.grad(loss)(alpha)
    assert np.isfinite(np.asarray(grad)).all() and float(jnp.abs(grad).sum()) > 0


def test_scdeepsort_use_bsr():
    """scDeepSort trains end-to-end on the Pallas BSR fast path."""
    from dance_tpu.modules.single_modality.cell_type_annotation import ScDeepSort

    g, rng = _toy_bipartite(seed=1, n_cells=80, n_genes=30)
    labels = rng.integers(0, 3, 80)
    model = ScDeepSort(dim_in=6, dim_hid=16, num_layers=2, seed=0)
    model.fit(g, labels, epochs=5, use_bsr=True)
    pred = model.predict(g)
    assert pred.shape == (80,)


def _gat_dense_reference(adj, er, el, h, slope=0.2):
    """O(n^2) dense reference for the fused GAT kernel."""
    logits = er[:, None] + el[None, :]
    logits = np.where(logits >= 0, logits, slope * logits)
    logits = np.where(np.asarray(adj.todense()) != 0, logits, -np.inf)
    m = logits.max(1, keepdims=True)
    m = np.maximum(m, -1e30)
    p = np.exp(logits - m)
    p[~np.isfinite(logits)] = 0.0
    denom = np.maximum(p.sum(1, keepdims=True), 1e-12)
    return (p / denom) @ h


def test_bsr_gat_matches_dense():
    """Fused Pallas GAT (SDDMM + edge softmax + SpMM) matches a dense ref."""
    from dance_tpu.ops.pallas_kernels import bsr_from_scipy, bsr_gat, bsr_gat_scan

    rng2 = np.random.default_rng(4)
    n = 300
    adj = sp.random(n, n, density=0.03, random_state=4, dtype=np.float32,
                    format="csr")
    adj.setdiag(1.0)
    er = rng2.normal(0, 1, n).astype(np.float32)
    el = rng2.normal(0, 1, n).astype(np.float32)
    h = rng2.random((n, 10), dtype=np.float32)
    ref = _gat_dense_reference(adj, er, el, h)

    bsr = bsr_from_scipy(adj)
    out = bsr_gat(bsr, jnp.asarray(er), jnp.asarray(el), jnp.asarray(h),
                  interpret=True)[:n]
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)

    out_scan = bsr_gat_scan(bsr, jnp.asarray(er), jnp.asarray(el),
                            jnp.asarray(h))[:n]
    np.testing.assert_allclose(np.asarray(out_scan), ref, rtol=1e-4, atol=1e-5)


def test_bsr_gat_ad_gradients():
    """bsr_gat_ad gradients match autodiff through the scan reference."""
    from dance_tpu.ops.pallas_kernels import bsr_from_scipy, bsr_gat_ad, bsr_gat_scan

    rng2 = np.random.default_rng(5)
    n = 200
    adj = sp.random(n, n, density=0.05, random_state=5, dtype=np.float32,
                    format="csr")
    adj.setdiag(1.0)
    er = jnp.asarray(rng2.normal(0, 1, n).astype(np.float32))
    el = jnp.asarray(rng2.normal(0, 1, n).astype(np.float32))
    h = jnp.asarray(rng2.random((n, 6), dtype=np.float32))
    bsr = bsr_from_scipy(adj)

    def loss_fast(er_, el_, h_):
        return jnp.sum(bsr_gat_ad(bsr, er_, el_, h_)[:n] ** 2)

    def loss_ref(er_, el_, h_):
        return jnp.sum(bsr_gat_scan(bsr, er_, el_, h_)[:n] ** 2)

    g_fast = jax.grad(loss_fast, argnums=(0, 1, 2))(er, el, h)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(er, el, h)
    for a, b in zip(g_fast, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=1e-4)


def test_gatconv_bsr_parity(graph):
    """GATConv over BSR (fused kernel per head) matches the CSR path."""
    from dance_tpu.nn.gnn import GATConv
    from dance_tpu.ops.pallas_kernels import bsr_from_scipy
    from dance_tpu.ops.sparse import csr_from_scipy

    adj, h = graph
    layer = GATConv(6, num_heads=2)
    params = layer.init(jax.random.key(0), csr_from_scipy(adj), h)
    out_csr = layer.apply(params, csr_from_scipy(adj), h)
    out_bsr = layer.apply(params, bsr_from_scipy(adj), h)
    np.testing.assert_allclose(np.asarray(out_bsr), np.asarray(out_csr),
                               rtol=2e-3, atol=2e-3)


def test_construct_basic_feature_graph():
    """Reference-named builder: raw nonzero weights over train+test cells,
    batch-feature ndata covering every node (parity: graph_construct.py:305)."""
    import scipy.sparse as sp

    from dance_tpu.data import AnnData
    from dance_tpu.transforms.graph_construct import (
        construct_basic_feature_graph, gen_batch_features)

    x_tr = sp.random(30, 20, density=0.2, random_state=0, format="csr",
                     dtype=np.float32)
    x_te = sp.random(10, 20, density=0.2, random_state=1, format="csr",
                     dtype=np.float32)
    g = construct_basic_feature_graph(x_tr, x_te)
    assert g.info == {"num_cells": 40, "num_genes": 20}
    assert g.adj.shape == (60, 60)
    # raw expression weights, both directions
    assert g.adj.nnz == 2 * (x_tr.nnz + x_te.nnz)
    np.testing.assert_allclose(np.sort(g.adj.data),
                               np.sort(np.concatenate([x_tr.data, x_te.data] * 2)))
    assert g.ndata["bf"].shape == (60,)

    ad1 = AnnData(X=np.abs(np.random.default_rng(0).random((30, 20))))
    ad1.obs["batch"] = ["a"] * 15 + ["b"] * 15
    bf = gen_batch_features([ad1])
    assert bf.shape == (30, 9)
    # per-batch rows are identical within a batch
    assert np.allclose(bf[:15], bf[0]) and np.allclose(bf[15:], bf[15])
    g2 = construct_basic_feature_graph(sp.csr_matrix(ad1.X), bf_input=[ad1])
    assert g2.ndata["bf"].shape == (50, 9)
    assert np.allclose(g2.ndata["bf"][:20], 0)


def test_tile_expansion_and_resolve_use_bsr():
    """The use_bsr="auto" policy: explicit flags pass through; off-TPU auto
    resolves False; the expansion metric separates banded from unbanded."""
    import numpy as np
    import scipy.sparse as sp

    from dance_tpu.ops.pallas_kernels import (resolve_use_bsr, rcm_reorder,
                                              tile_expansion)

    # banded matrix: a dense 33-wide band inside the 128-block diagonal
    n = 512
    banded = sp.csr_matrix(sp.diags(
        [np.ones(n - abs(o)) for o in range(-16, 17)], list(range(-16, 17))))
    assert tile_expansion(banded, 128) < 50
    # scattered permutation matrix touches ~n tiles -> high expansion
    rng = np.random.default_rng(0)
    perm = rng.permutation(n)
    scattered = sp.csr_matrix((np.ones(n), (np.arange(n), perm)), shape=(n, n))
    assert tile_expansion(scattered, 128) > 150  # above the auto threshold
    # RCM re-bands a shuffled banded matrix back to low expansion
    shuffled = banded[perm][:, perm]
    _, rebanded = rcm_reorder(shuffled)
    assert tile_expansion(rebanded, 128) < 50

    assert resolve_use_bsr(True, scattered) is True
    assert resolve_use_bsr(False, banded) is False
    import jax
    if jax.default_backend() != "tpu":
        assert resolve_use_bsr("auto", banded) is False
    else:
        assert resolve_use_bsr("auto", shuffled) is True  # RCM re-bands it
        assert resolve_use_bsr("auto", scattered, reorder=False) is False


def test_dense_adj_spmm(graph):
    """DenseAdj (one-matmul SpMM) matches the CSR segment path exactly."""
    from dance_tpu.ops.segment import spmm
    from dance_tpu.ops.sparse import csr_from_scipy, dense_adj_from_scipy
    adj, h = graph
    csr = csr_from_scipy(adj)
    dense = dense_adj_from_scipy(adj)
    for op in ("sum", "mean"):
        for weighted in (True, False):
            ref = spmm(csr, h, weighted=weighted, op=op)
            out = spmm(dense, h, weighted=weighted, op=op)
            np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
    with pytest.raises(ValueError):
        spmm(dense, h, op="max")


def test_choose_adj_format():
    """Density dispatch: dense above threshold, BSR/CSR rules below; CPU->csr."""
    from dance_tpu.ops.pallas_kernels import choose_adj_format
    dense_ish = sp.random(256, 256, density=0.2, random_state=0, format="csr",
                          dtype=np.float32)
    sparse_scattered = sp.csr_matrix(
        (np.ones(256, np.float32),
         (np.arange(256), np.random.default_rng(0).permutation(256))),
        shape=(256, 256))
    if jax.default_backend() == "tpu":
        assert choose_adj_format(dense_ish) == "dense"
        assert choose_adj_format(sparse_scattered, reorder=False) == "csr"
        # memory cap: a dense operand that would exceed the budget falls back
        assert choose_adj_format(dense_ish, dense_max_bytes=1000) != "dense"
    else:
        assert choose_adj_format(dense_ish) == "csr"


def test_graphsc_dense_adj_fit():
    """GraphSC trains through the DenseAdj path (forced) and matches the CSR
    path's loss trajectory on a small graph."""
    from dance_tpu.graph import Graph
    from dance_tpu.modules.single_modality.clustering import GraphSC
    from dance_tpu.ops.sparse import dense_adj_from_scipy

    rng = np.random.default_rng(1)
    expr = sp.random(60, 20, density=0.3, random_state=1, dtype=np.float32,
                     format="csr")
    g = Graph.from_cell_feature_matrix(
        expr, rng.random((60, 8), dtype=np.float32),
        rng.random((20, 8), dtype=np.float32))

    zs = []
    for fmt in ("csr", "dense"):
        m = GraphSC(n_clusters=3, seed=0, in_feats=8, hidden_dim=16, hidden_1=8)
        if fmt == "dense":
            # monkeypatch the auto choice to exercise the dense path off-TPU
            m.fit(g, epochs=3, use_bsr=False)
            import dance_tpu.modules.single_modality.clustering.graphsc as G
            dg = g.to_device()
            conv_adj = dense_adj_from_scipy(g.adj)
            import jax as _jax
            emb = m.model.apply({"params": m.params}, conv_adj,
                                dg.ndata["features"])[1]
            zs.append(np.asarray(emb))
        else:
            m.fit(g, epochs=3, use_bsr=False)
            dg = g.to_device()
            emb = m.model.apply({"params": m.params}, dg.adj,
                                dg.ndata["features"])[1]
            zs.append(np.asarray(emb))
    np.testing.assert_allclose(zs[0], zs[1], rtol=1e-3, atol=1e-4)


def test_graphsci_dense_adj_fit():
    """GraphSCI's gene-graph conv trains identically through the forced
    DenseAdj path (the auto dispatch engages it on TPU, where the correlation
    graph's density makes one MXU matmul the right SpMM)."""
    from dance_tpu.graph import Graph
    from dance_tpu.modules.single_modality.imputation import GraphSCI
    import dance_tpu.ops.pallas_kernels as pk

    rng = np.random.default_rng(0)
    x = rng.poisson(1.0, (80, 40)).astype(np.float32)
    xl = np.log1p(x)
    corr = np.corrcoef(xl.T)
    adj = sp.csr_matrix((np.abs(corr) > 0.3).astype(np.float32))
    deg = np.asarray(adj.sum(1)).ravel()
    dinv = sp.diags(1.0 / np.sqrt(np.maximum(deg, 1e-12)))
    g = Graph(sp.csr_matrix(dinv @ adj @ dinv))

    preds = []
    for fmt in ("csr", "dense"):
        m = GraphSCI(num_cells=80, num_genes=40, seed=0)
        m.n_epochs = 3
        if fmt == "dense":
            orig = pk.choose_adj_format
            pk.choose_adj_format = lambda *a, **k: "dense"
            try:
                m.fit(g, xl, x)
            finally:
                pk.choose_adj_format = orig
        else:
            m.fit(g, xl, x)
        preds.append(m.predict())
    np.testing.assert_allclose(preds[0], preds[1], rtol=1e-4, atol=1e-5)


def test_scheteronet_dense_hop_fit():
    """scHeteroNet's auto format upgrades hop adjacencies to the dense MXU
    regime (forced here); predictions match the CSR path to f32 roundoff.
    At bench scale the strict two-hop of kNN-15 sits at ~2% density where the
    dense matmul wins."""
    from dance_tpu.datasets.synthetic import synthetic_expression
    from dance_tpu.graph import Graph
    from dance_tpu.modules.single_modality.cell_type_annotation import scHeteroNet
    from dance_tpu.ops.neighbors import knn_graph
    import dance_tpu.ops.pallas_kernels as pk

    x, y = synthetic_expression(150, 40, 3, seed=0)
    xl = np.log1p(x)
    adj = knn_graph(xl[:, :16], 6, mode="connectivity")

    preds = []
    for fmt in ("csr", "dense"):
        g = Graph(adj, ndata={"feat": xl})
        m = scHeteroNet(hidden_channels=8, num_layers=2, seed=0)
        if fmt == "dense":
            orig = pk.choose_adj_format
            pk.choose_adj_format = lambda *a, **k: "dense"
            try:
                m.fit(g, y, x_raw=x, epochs=3, use_bsr="auto")
            finally:
                pk.choose_adj_format = orig
        else:
            m.fit(g, y, x_raw=x, epochs=3, use_bsr=False)
        preds.append(m.predict_proba())
    np.testing.assert_allclose(preds[0], preds[1], rtol=1e-4, atol=1e-5)

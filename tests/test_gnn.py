"""GNN layer + kernel tests: segment ops vs scipy, Pallas BSR SpMM vs dense."""

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

"""Pallas TPU kernels for sparse graph ops.

Block-sparse SpMM: the unstructured cell-gene adjacency is re-laid out on the
host as 128×128 dense tiles (BSR) covering only nonzero blocks; the kernel is
then a stream of gather-free dense matmuls on the MXU with in-VMEM accumulation
across consecutive same-row tiles (the canonical TPU reduction pattern). This
replaces DGL's C++ SpMM (SURVEY.md §2.8).

Measured (sustained, dependent-chain harness, v5e): ~4× faster than the XLA
segment-sum path on k=15 kNN graphs (~8× after :func:`rcm_reorder` banding),
~1.3× on cell-gene bipartite graphs; on uniformly-random high-density
adjacencies where every tile is nonzero the segment-sum path can win — pick
per workload (`Graph.to_device()` vs `Graph.to_bsr()`).
"""

from functools import partial
from typing import NamedTuple  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 128


@jax.tree_util.register_pytree_node_class
class BSRMatrix:
    """Block-sparse row matrix: dense nonzero tiles sorted by block-row.

    ``shape`` is pytree aux-data (static under jit)."""

    def __init__(self, blocks, block_rows, block_cols, shape):
        self.blocks = blocks          # (nb, BLOCK, BLOCK) dense tiles
        self.block_rows = block_rows  # (nb,) block-row index, sorted
        self.block_cols = block_cols  # (nb,) block-col index
        self.shape = tuple(shape)     # padded (n_rows, n_cols)

    def tree_flatten(self):
        return (self.blocks, self.block_rows, self.block_cols), self.shape

    @classmethod
    def tree_unflatten(cls, shape, children):
        return cls(*children, shape)

    @property
    def nb(self) -> int:
        return self.blocks.shape[0]


def bsr_from_scipy(adj: sp.spmatrix, block: int = BLOCK) -> BSRMatrix:
    """Host-side tiling of a scipy sparse matrix into sorted dense blocks.

    Every block-row and block-column is guaranteed covered by at least one
    tile (zero tiles pad the empties), so the kernel's first-visit
    zero-initialization reaches every output row — including for the
    transpose used in the backward pass — and adjacencies without self-loops
    are safe.
    """
    adj = sp.csr_matrix(adj)
    n, m = adj.shape
    np_, mp = -(-n // block) * block, -(-m // block) * block
    if (np_, mp) != (n, m):
        adj = sp.csr_matrix((adj.data, adj.indices, adj.indptr), shape=(n, m))
        adj.resize((np_, mp))
    bsr = adj.tobsr(blocksize=(block, block))
    bsr.sort_indices()
    block_rows = np.repeat(np.arange(len(bsr.indptr) - 1), np.diff(bsr.indptr))
    block_cols = np.asarray(bsr.indices)
    blocks = np.asarray(bsr.data, dtype=np.float32)
    miss_r = np.setdiff1d(np.arange(np_ // block), block_rows)
    miss_c = np.setdiff1d(np.arange(mp // block), block_cols)
    n_extra = max(len(miss_r), len(miss_c))
    if n_extra:
        # pair missing rows with missing cols where possible; 0 otherwise
        er = np.concatenate([miss_r, np.zeros(n_extra - len(miss_r), np.int64)])
        ec = np.concatenate([miss_c, np.zeros(n_extra - len(miss_c), np.int64)])
        block_rows = np.concatenate([block_rows, er])
        block_cols = np.concatenate([block_cols, ec])
        blocks = np.concatenate(
            [blocks, np.zeros((n_extra, block, block), np.float32)])
        order = np.argsort(block_rows, kind="stable")
        block_rows, block_cols, blocks = block_rows[order], block_cols[order], blocks[order]
    return BSRMatrix(jnp.asarray(blocks, jnp.float32),
                     jnp.asarray(block_rows, jnp.int32),
                     jnp.asarray(block_cols, jnp.int32), (np_, mp))


def _spmm_kernel(brows_ref, bcols_ref, blocks_ref, b_ref, out_ref):
    i = pl.program_id(1)  # block index (innermost: consecutive same-row visits)

    @pl.when((i == 0) | (brows_ref[i] != brows_ref[jnp.maximum(i - 1, 0)]))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += jnp.dot(blocks_ref[0], b_ref[:], preferred_element_type=jnp.float32)


@partial(jax.jit, static_argnames=("d_tile", "interpret", "compute_dtype"))
def bsr_spmm(bsr: BSRMatrix, b: jax.Array, *, d_tile: int = 128,
             interpret: bool = None, compute_dtype=None) -> jax.Array:
    """out = A @ B with A in BSR form; B is (n_cols_padded, d).

    ``interpret=None`` auto-selects interpreter mode off-TPU (the Mosaic
    backend only compiles for TPU). ``compute_dtype=jnp.bfloat16`` streams the
    tiles and B through HBM at half width (the kernel is bandwidth-bound); the
    MXU still accumulates in f32 and the output stays f32."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_rows, n_cols = bsr.shape
    d = b.shape[1]
    dp = -(-d // d_tile) * d_tile
    if b.shape != (n_cols, dp):
        b = jnp.pad(b, ((0, n_cols - b.shape[0]), (0, dp - d)))
    blocks = bsr.blocks
    if compute_dtype is not None:
        blocks = blocks.astype(compute_dtype)
        b = b.astype(compute_dtype)
    itemsize = jnp.dtype(blocks.dtype).itemsize
    grid = (dp // d_tile, bsr.nb)
    out = pl.pallas_call(
        _spmm_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, BLOCK, BLOCK), lambda j, i, brows, bcols: (i, 0, 0)),
                pl.BlockSpec((BLOCK, d_tile), lambda j, i, brows, bcols: (bcols[i], j)),
            ],
            out_specs=pl.BlockSpec((BLOCK, d_tile),
                                   lambda j, i, brows, bcols: (brows[i], j)),
        ),
        out_shape=jax.ShapeDtypeStruct((n_rows, dp), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * bsr.nb * BLOCK * BLOCK * dp,
            bytes_accessed=bsr.nb * BLOCK * BLOCK * itemsize + n_cols * dp * itemsize,
            transcendentals=0,
        ),
    )(bsr.block_rows, bsr.block_cols, blocks, b)
    return out[:, :d]


def _sddmm_kernel(brows_ref, bcols_ref, g_ref, bt_ref, out_ref):
    j = pl.program_id(1)  # feature tile (innermost: accumulate into one block)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # b arrives pre-transposed (d, n_cols) so this is a plain MXU matmul —
    # an in-kernel g @ bᵀ costs a per-tile transpose on TPU
    out_ref[0] += jnp.dot(g_ref[:], bt_ref[:],
                          preferred_element_type=jnp.float32)


@partial(jax.jit, static_argnames=("d_tile", "interpret", "compute_dtype"))
def bsr_sddmm(brows: jax.Array, bcols: jax.Array, g: jax.Array, b: jax.Array,
              *, d_tile: int = 128, interpret: bool = None,
              compute_dtype=None) -> jax.Array:
    """Sampled dense-dense matmul onto a BSR pattern:
    ``out[k] = g[rows_k] @ b[cols_k]ᵀ`` for each nonzero block k.

    This is the ``dA`` term of the SpMM backward. The XLA formulation
    (``einsum over g3[brows], b3[bcols]``) materializes both gathers in HBM
    (~2× the tile stream); this kernel reads each (row, col) tile pair
    directly and writes only the output blocks. ``g`` is (n_rows_padded, d),
    ``b`` is (n_cols_padded, d), both padded to BLOCK multiples."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nb = brows.shape[0]
    d = g.shape[1]
    dp = -(-d // d_tile) * d_tile
    if dp != d:
        g = jnp.pad(g, ((0, 0), (0, dp - d)))
        b = jnp.pad(b, ((0, 0), (0, dp - d)))
    if compute_dtype is not None:
        # one cheap full-array cast; the kernel then re-reads each node tile
        # once per visiting block at half width
        g, b = g.astype(compute_dtype), b.astype(compute_dtype)
    bt = b.T  # one HBM pass; lets the kernel run transpose-free matmuls
    grid = (nb, dp // d_tile)
    return pl.pallas_call(
        _sddmm_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((BLOCK, d_tile), lambda i, j, brows, bcols: (brows[i], j)),
                pl.BlockSpec((d_tile, BLOCK), lambda i, j, brows, bcols: (j, bcols[i])),
            ],
            out_specs=pl.BlockSpec((1, BLOCK, BLOCK),
                                   lambda i, j, brows, bcols: (i, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((nb, BLOCK, BLOCK), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * BLOCK * BLOCK * dp,
            bytes_accessed=2 * nb * BLOCK * dp * 4 + nb * BLOCK * BLOCK * 4,
            transcendentals=0,
        ),
    )(brows, bcols, g, bt)


def bsr_transpose(bsr: BSRMatrix) -> BSRMatrix:
    """Aᵀ in BSR form: transpose each tile, swap block row/col, re-sort by row.

    Traced-friendly (argsort feeds the scalar-prefetch index maps at run time);
    the kernel only needs block_rows sorted so same-row visits stay consecutive.
    """
    order = jnp.argsort(bsr.block_cols, stable=True)
    return BSRMatrix(jnp.transpose(bsr.blocks[order], (0, 2, 1)),
                     bsr.block_cols[order], bsr.block_rows[order],
                     (bsr.shape[1], bsr.shape[0]))


def bsr_spmm_ad(bsr: BSRMatrix, b: jax.Array, *, interpret: bool = None,
                compute_dtype=None) -> jax.Array:
    """Differentiable ``A @ B`` on the BSR kernel.

    Backward: ``dB = Aᵀ ḡ`` (another BSR SpMM over transposed tiles) and
    ``dA[k] = ḡ[row_k] B[col_k]ᵀ`` (per-block SDDMM) so trainable edge weights
    also work. :func:`bsr_from_scipy` covers every block-row/col with at least
    one tile, so both directions zero-initialize every output row.
    ``compute_dtype=jnp.bfloat16`` halves the HBM stream in both directions
    (f32 accumulation; measured 1.5× on cell-gene bipartite graphs).
    """
    return _bsr_spmm_core(bsr.blocks, bsr.block_rows, bsr.block_cols, b,
                          bsr.shape, interpret, compute_dtype)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _bsr_spmm_core(blocks, brows, bcols, b, shape, interpret, compute_dtype=None):
    return bsr_spmm(BSRMatrix(blocks, brows, bcols, shape), b,
                    interpret=interpret, compute_dtype=compute_dtype)


def _bsr_spmm_fwd(blocks, brows, bcols, b, shape, interpret, compute_dtype):
    return (_bsr_spmm_core(blocks, brows, bcols, b, shape, interpret,
                           compute_dtype), (blocks, brows, bcols, b))


def _bsr_spmm_bwd(shape, interpret, compute_dtype, res, g):
    blocks, brows, bcols, b = res
    n_rows, n_cols = shape
    block = blocks.shape[1]
    gp = jnp.pad(g, ((0, n_rows - g.shape[0]), (0, 0)))
    bp = jnp.pad(b, ((0, n_cols - b.shape[0]), (0, 0)))
    at = bsr_transpose(BSRMatrix(blocks, brows, bcols, shape))
    db = bsr_spmm(at, gp, interpret=interpret,
                  compute_dtype=compute_dtype)[:b.shape[0]]
    if block == BLOCK and compute_dtype is not None:
        # Pallas SDDMM reads the (row, col) tile pairs directly; measured a
        # win only at reduced width (bf16 min 3.4 ms vs einsum 4.0 ms on the
        # 12k×2k bipartite graph) — in f32 XLA's gather+einsum is on par, so
        # it stays the default path.
        dblocks = bsr_sddmm(brows, bcols, gp, bp, interpret=interpret,
                            compute_dtype=compute_dtype)
    else:
        g3 = gp.reshape(n_rows // block, block, -1)
        b3 = bp.reshape(n_cols // block, block, -1)
        dblocks = jnp.einsum("kbd,kcd->kbc", g3[brows], b3[bcols])
    zi = jnp.zeros((), jax.dtypes.float0)
    return (dblocks, jnp.broadcast_to(zi, brows.shape),
            jnp.broadcast_to(zi, bcols.shape), db)


_bsr_spmm_core.defvjp(_bsr_spmm_fwd, _bsr_spmm_bwd)


def pallas_spmm(adj: sp.spmatrix, h, *, interpret: bool = False):
    """Convenience wrapper: scipy adjacency × dense features via the kernel.

    Safe for adjacencies with empty rows: :func:`bsr_from_scipy` pads every
    block-row/col with a zero tile, so unvisited-output garbage cannot occur.
    """
    bsr = bsr_from_scipy(adj)
    h = jnp.asarray(h, jnp.float32)
    n_rows = adj.shape[0]
    out = bsr_spmm(bsr, jnp.pad(h, ((0, bsr.shape[1] - h.shape[0]), (0, 0))),
                   interpret=interpret)
    return out[:n_rows]


__all__ = ["BipartiteBSR", "BSRMatrix", "bipartite_bsr", "bsr_from_scipy",
           "bsr_gat", "bsr_gat_ad", "bsr_gat_grads", "bsr_gat_scan",
           "bsr_gat_stats", "bsr_spmm", "bsr_spmm_ad", "bsr_spmm_max",
           "bsr_transpose",
           "bsr_with_rcm", "choose_adj_format", "pallas_spmm", "rcm_reorder",
           "resolve_use_bsr", "tile_expansion", "unpermute"]


# --------------------------------------------------------------------------
# Fused GAT attention: SDDMM + edge softmax + SpMM in one streaming pass
# --------------------------------------------------------------------------
#
# The reference's GAT layers (PyG GATConv in STAGATE, stagate.py:31) lower to
# three sparse ops: per-edge logits (SDDMM), per-destination softmax, and the
# attention-weighted SpMM. On TPU the natural fusion is flash-attention over
# the nonzero BSR tiles: stream each block-row's tiles through VMEM keeping a
# running (max, sum, accumulator) triple, so the full edge-attention never
# materializes in HBM. Single attention head per call (vmap/loop for multi-
# head). ``blocks != 0`` marks true edges — zero-weight edges are treated as
# absent (GAT adjacencies are connectivity masks, so this is exact).



def _att_activation(raw, negative_slope: float, act: str):
    """Attention-logit nonlinearity: 'leaky_relu' (standard GAT) or 'sigmoid'
    (STAGATE's custom GATConv, reference stagate.py:125-126)."""
    if act == "sigmoid":
        return 1.0 / (1.0 + jnp.exp(-raw))
    return jnp.where(raw >= 0, raw, negative_slope * raw)


def _att_activation_grad(raw, negative_slope: float, act: str):
    if act == "sigmoid":
        s = 1.0 / (1.0 + jnp.exp(-raw))
        return s * (1.0 - s)
    return jnp.where(raw >= 0, 1.0, negative_slope)


def _gat_kernel(brows_ref, bcols_ref, blocks_ref, er_ref, el_ref, h_ref, out_ref,
                m_ref, l_ref, acc_ref, *, negative_slope: float, act: str):
    i = pl.program_id(1)  # tile index (innermost: same-row tiles consecutive)

    @pl.when((i == 0) | (brows_ref[i] != brows_ref[jnp.maximum(i - 1, 0)]))
    def _():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    mask = blocks_ref[0] != 0.0                      # (B, B) true edges
    logits = er_ref[:] + el_ref[:].reshape(1, -1)    # dst + src contributions
    logits = _att_activation(logits, negative_slope, act)
    logits = jnp.where(mask, logits, -jnp.inf)

    m_new = jnp.maximum(m_ref[:], logits.max(axis=1, keepdims=True))
    m_new = jnp.maximum(m_new, -1e30)                # rows with no edges so far
    p = jnp.where(mask, jnp.exp(logits - m_new), 0.0)
    scale = jnp.exp(m_ref[:] - m_new)
    l_ref[:] = l_ref[:] * scale + p.sum(axis=1, keepdims=True)
    acc_ref[:] = acc_ref[:] * scale + jnp.dot(p, h_ref[:],
                                              preferred_element_type=jnp.float32)
    m_ref[:] = m_new
    # same output tile is revisited for every tile of this block-row; the
    # final visit's write is the complete softmax-normalized row
    out_ref[:] = acc_ref[:] / jnp.maximum(l_ref[:], 1e-12)


@partial(jax.jit, static_argnames=("negative_slope", "d_tile", "interpret", "act"))
def bsr_gat(bsr: BSRMatrix, er: jax.Array, el: jax.Array, h: jax.Array, *,
            negative_slope: float = 0.2, d_tile: int = 128,
            interpret: bool = None, act: str = "leaky_relu") -> jax.Array:
    """Fused single-head GAT: ``out[i] = Σ_j softmax_i(lrelu(er_i + el_j)) h_j``
    over A's edges. ``er``: (n_rows,) destination logits, ``el``: (n_cols,)
    source logits, ``h``: (n_cols, d) source features."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_rows, n_cols = bsr.shape
    d = h.shape[1]
    dp = -(-d // d_tile) * d_tile
    h = jnp.pad(h, ((0, n_cols - h.shape[0]), (0, dp - d)))
    er = jnp.pad(er, (0, n_rows - er.shape[0]), constant_values=0.0)
    el = jnp.pad(el, (0, n_cols - el.shape[0]), constant_values=0.0)
    grid = (dp // d_tile, bsr.nb)
    out = pl.pallas_call(
        partial(_gat_kernel, negative_slope=negative_slope, act=act),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, BLOCK, BLOCK), lambda j, i, br, bc: (i, 0, 0)),
                pl.BlockSpec((BLOCK, 1), lambda j, i, br, bc: (br[i], 0)),
                pl.BlockSpec((BLOCK, 1), lambda j, i, br, bc: (bc[i], 0)),
                pl.BlockSpec((BLOCK, d_tile), lambda j, i, br, bc: (bc[i], j)),
            ],
            out_specs=pl.BlockSpec((BLOCK, d_tile),
                                   lambda j, i, br, bc: (br[i], j)),
            scratch_shapes=[
                pltpu.VMEM((BLOCK, 1), jnp.float32),      # running max
                pltpu.VMEM((BLOCK, 1), jnp.float32),      # running sum
                pltpu.VMEM((BLOCK, d_tile), jnp.float32),  # running output
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_rows, dp), jnp.float32),
        interpret=interpret,
    )(bsr.block_rows, bsr.block_cols, bsr.blocks, er[:, None], el[:, None], h)
    return out[:, :d]


def _gat_stats_kernel(brows_ref, bcols_ref, blocks_ref, er_ref, el_ref, h_ref,
                      out_ref, m_out_ref, l_out_ref, m_ref, l_ref, acc_ref, *,
                      negative_slope: float, act: str):
    """Forward kernel variant that also emits the per-row softmax statistics
    (running max ``m`` and normalizer ``l``) the flash backward needs."""
    i = pl.program_id(1)

    @pl.when((i == 0) | (brows_ref[i] != brows_ref[jnp.maximum(i - 1, 0)]))
    def _():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    mask = blocks_ref[0] != 0.0
    logits = er_ref[:] + el_ref[:].reshape(1, -1)
    logits = _att_activation(logits, negative_slope, act)
    logits = jnp.where(mask, logits, -jnp.inf)

    m_new = jnp.maximum(jnp.maximum(m_ref[:], logits.max(axis=1, keepdims=True)),
                        -1e30)
    p = jnp.where(mask, jnp.exp(logits - m_new), 0.0)
    scale = jnp.exp(m_ref[:] - m_new)
    l_ref[:] = l_ref[:] * scale + p.sum(axis=1, keepdims=True)
    acc_ref[:] = acc_ref[:] * scale + jnp.dot(p, h_ref[:],
                                              preferred_element_type=jnp.float32)
    m_ref[:] = m_new
    out_ref[:] = acc_ref[:] / jnp.maximum(l_ref[:], 1e-12)
    m_out_ref[:] = m_ref[:]
    l_out_ref[:] = l_ref[:]


@partial(jax.jit, static_argnames=("negative_slope", "d_tile", "interpret", "act"))
def bsr_gat_stats(bsr: BSRMatrix, er: jax.Array, el: jax.Array, h: jax.Array, *,
                  negative_slope: float = 0.2, d_tile: int = 128,
                  interpret: bool = None, act: str = "leaky_relu"):
    """:func:`bsr_gat` that also returns the softmax stats ``(out, m, l)``."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_rows, n_cols = bsr.shape
    d = h.shape[1]
    dp = -(-d // d_tile) * d_tile
    h = jnp.pad(h, ((0, n_cols - h.shape[0]), (0, dp - d)))
    er = jnp.pad(er, (0, n_rows - er.shape[0]))
    el = jnp.pad(el, (0, n_cols - el.shape[0]))
    grid = (dp // d_tile, bsr.nb)
    out, m, l = pl.pallas_call(
        partial(_gat_stats_kernel, negative_slope=negative_slope, act=act),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, BLOCK, BLOCK), lambda j, i, br, bc: (i, 0, 0)),
                pl.BlockSpec((BLOCK, 1), lambda j, i, br, bc: (br[i], 0)),
                pl.BlockSpec((BLOCK, 1), lambda j, i, br, bc: (bc[i], 0)),
                pl.BlockSpec((BLOCK, d_tile), lambda j, i, br, bc: (bc[i], j)),
            ],
            out_specs=[
                pl.BlockSpec((BLOCK, d_tile), lambda j, i, br, bc: (br[i], j)),
                pl.BlockSpec((BLOCK, 1), lambda j, i, br, bc: (br[i], 0)),
                pl.BlockSpec((BLOCK, 1), lambda j, i, br, bc: (br[i], 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((BLOCK, 1), jnp.float32),
                pltpu.VMEM((BLOCK, 1), jnp.float32),
                pltpu.VMEM((BLOCK, d_tile), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n_rows, dp), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, 1), jnp.float32),
        ],
        interpret=interpret,
    )(bsr.block_rows, bsr.block_cols, bsr.blocks, er[:, None], el[:, None], h)
    return out[:, :d], m[:, 0], l[:, 0]


def _gat_bwd_kernel(brows_ref, bcols_ref, fv_ref, blocks_ref, er_ref, el_ref,
                    h_ref, g_ref, m_ref, l_ref, r_ref, dh_ref, der_ref, del_ref,
                    *, negative_slope: float, act: str):
    """Flash-GAT backward: one streaming pass over the nonzero tiles.

    With the forward stats (m, l) and r_i = ḡ_i·out_i, the softmax jacobian
    reduces per tile to ``da = p ⊙ (ḡ hᵀ − r) ⊙ lrelu'``; ``der`` accumulates
    by destination (consecutive same-row visits, forward-style zero-init),
    ``del``/``dh`` by source (first-visit flags precomputed from the column
    sequence). The attention matrix never materializes in HBM.
    """
    i = pl.program_id(0)

    @pl.when((i == 0) | (brows_ref[i] != brows_ref[jnp.maximum(i - 1, 0)]))
    def _():
        der_ref[:] = jnp.zeros_like(der_ref)

    @pl.when(fv_ref[i] == 1)
    def _():
        dh_ref[:] = jnp.zeros_like(dh_ref)
        del_ref[:] = jnp.zeros_like(del_ref)

    mask = blocks_ref[0] != 0.0
    raw = er_ref[:] + el_ref[:].reshape(1, -1)
    logits = _att_activation(raw, negative_slope, act)
    p = jnp.where(mask, jnp.exp(logits - m_ref[:]), 0.0)
    p = p / jnp.maximum(l_ref[:], 1e-12)
    s = jnp.dot(g_ref[:], h_ref[:].T, preferred_element_type=jnp.float32)
    dlogit = p * (s - r_ref[:])
    da = dlogit * _att_activation_grad(raw, negative_slope, act)
    der_ref[:] += da.sum(axis=1, keepdims=True)
    del_ref[:] += da.sum(axis=0)[:, None]
    dh_ref[:] += jnp.dot(p.T, g_ref[:], preferred_element_type=jnp.float32)


@partial(jax.jit, static_argnames=("negative_slope", "interpret", "act"))
def bsr_gat_grads(bsr: BSRMatrix, er: jax.Array, el: jax.Array, h: jax.Array,
                  g: jax.Array, out: jax.Array, m: jax.Array, l: jax.Array, *,
                  negative_slope: float = 0.2, interpret: bool = None,
                  act: str = "leaky_relu"):
    """Gradients (der, del, dh) of :func:`bsr_gat` via the flash backward.

    Streams the whole feature width per tile (d padded to a lane multiple);
    suited to the GNN regime (d ≤ ~2k fits VMEM alongside the tile buffers).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_rows, n_cols = bsr.shape
    n_src, d = h.shape
    dp = -(-d // 128) * 128
    hp = jnp.pad(h, ((0, n_cols - n_src), (0, dp - d)))
    gp = jnp.pad(g, ((0, n_rows - g.shape[0]), (0, dp - d)))
    outp = jnp.pad(out, ((0, n_rows - out.shape[0]), (0, dp - d)))
    erp = jnp.pad(er, (0, n_rows - er.shape[0]))
    elp = jnp.pad(el, (0, n_cols - el.shape[0]))
    mp = jnp.pad(m, (0, n_rows - m.shape[0]))
    lp = jnp.pad(l, (0, n_rows - l.shape[0]))
    r = (gp * outp).sum(axis=1, keepdims=True)  # r_i = ḡ_i · out_i

    # first visit of each block-column in the row-sorted tile sequence
    nb = bsr.nb
    seq = jnp.arange(nb, dtype=jnp.int32)
    first_idx = jnp.full((n_cols // BLOCK,), nb, jnp.int32).at[
        bsr.block_cols].min(seq)
    fv = (first_idx[bsr.block_cols] == seq).astype(jnp.int32)

    dh, der, del_ = pl.pallas_call(
        partial(_gat_bwd_kernel, negative_slope=negative_slope, act=act),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((1, BLOCK, BLOCK), lambda i, br, bc, fv: (i, 0, 0)),
                pl.BlockSpec((BLOCK, 1), lambda i, br, bc, fv: (br[i], 0)),
                pl.BlockSpec((BLOCK, 1), lambda i, br, bc, fv: (bc[i], 0)),
                pl.BlockSpec((BLOCK, dp), lambda i, br, bc, fv: (bc[i], 0)),
                pl.BlockSpec((BLOCK, dp), lambda i, br, bc, fv: (br[i], 0)),
                pl.BlockSpec((BLOCK, 1), lambda i, br, bc, fv: (br[i], 0)),
                pl.BlockSpec((BLOCK, 1), lambda i, br, bc, fv: (br[i], 0)),
                pl.BlockSpec((BLOCK, 1), lambda i, br, bc, fv: (br[i], 0)),
            ],
            out_specs=[
                pl.BlockSpec((BLOCK, dp), lambda i, br, bc, fv: (bc[i], 0)),
                pl.BlockSpec((BLOCK, 1), lambda i, br, bc, fv: (br[i], 0)),
                pl.BlockSpec((BLOCK, 1), lambda i, br, bc, fv: (bc[i], 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n_cols, dp), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_cols, 1), jnp.float32),
        ],
        interpret=interpret,
    )(bsr.block_rows, bsr.block_cols, fv, bsr.blocks, erp[:, None], elp[:, None],
      hp, gp, mp[:, None], lp[:, None], r)
    return (der[:er.shape[0], 0], del_[:el.shape[0], 0], dh[:n_src, :d])


def bsr_gat_scan(bsr: BSRMatrix, er: jax.Array, el: jax.Array, h: jax.Array, *,
                 negative_slope: float = 0.2, act: str = "leaky_relu") -> jax.Array:
    """Pure-XLA tile-streaming reference for :func:`bsr_gat` (same math, two
    ``lax.scan`` passes). Used for numeric parity tests and as the
    recomputation backward of :func:`bsr_gat_ad` — memory stays O(tiles
    in flight) instead of O(edges)."""
    n_rows, n_cols = bsr.shape
    d = h.shape[1]
    hp = jnp.pad(h, ((0, n_cols - h.shape[0]), (0, 0)))
    erp = jnp.pad(er, (0, n_rows - er.shape[0]))
    elp = jnp.pad(el, (0, n_cols - el.shape[0]))
    nbr = n_rows // BLOCK
    h3 = hp.reshape(n_cols // BLOCK, BLOCK, d)
    er3 = erp.reshape(nbr, BLOCK)
    el3 = elp.reshape(n_cols // BLOCK, BLOCK)

    def tile_logits(block, r, c):
        mask = block != 0.0
        logits = er3[r][:, None] + el3[c][None, :]
        logits = _att_activation(logits, negative_slope, act)
        return jnp.where(mask, logits, -jnp.inf)

    def max_pass(row_max, tile):
        block, r, c = tile
        tile_max = tile_logits(block, r, c).max(axis=1)
        return row_max.at[r].max(tile_max), None

    row_max, _ = jax.lax.scan(max_pass, jnp.full((nbr, BLOCK), -1e30),
                              (bsr.blocks, bsr.block_rows, bsr.block_cols))

    def sum_pass(carry, tile):
        denom, acc = carry
        block, r, c = tile
        p = jnp.exp(tile_logits(block, r, c) - row_max[r][:, None])
        p = jnp.where(block != 0.0, p, 0.0)
        return (denom.at[r].add(p.sum(axis=1)),
                acc.at[r].add(jnp.dot(p, h3[c],
                                      preferred_element_type=jnp.float32))), None

    (denom, acc), _ = jax.lax.scan(
        sum_pass, (jnp.zeros((nbr, BLOCK)), jnp.zeros((nbr, BLOCK, d))),
        (bsr.blocks, bsr.block_rows, bsr.block_cols))
    out = acc / jnp.maximum(denom, 1e-12)[:, :, None]
    return out.reshape(n_rows, d)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _bsr_gat_core(blocks, brows, bcols, args, shape, negative_slope, act):
    er, el, h = args
    bsr = BSRMatrix(blocks, brows, bcols, shape)
    return bsr_gat(bsr, er, el, h, negative_slope=negative_slope, act=act)


def _bsr_gat_fwd(blocks, brows, bcols, args, shape, negative_slope, act):
    er, el, h = args
    out, m, l = bsr_gat_stats(BSRMatrix(blocks, brows, bcols, shape), er, el, h,
                              negative_slope=negative_slope, act=act)
    return out, (blocks, brows, bcols, args, out, m, l)


def _bsr_gat_bwd(shape, negative_slope, act, res, g):
    blocks, brows, bcols, args, out, m, l = res
    er, el, h = args
    der, del_, dh = bsr_gat_grads(BSRMatrix(blocks, brows, bcols, shape), er, el,
                                  h, g, out, m, l, negative_slope=negative_slope,
                                  act=act)
    zi = jnp.zeros((), jax.dtypes.float0)
    return (jnp.zeros_like(blocks), jnp.broadcast_to(zi, brows.shape),
            jnp.broadcast_to(zi, bcols.shape), (der, del_, dh))


_bsr_gat_core.defvjp(_bsr_gat_fwd, _bsr_gat_bwd)


def bsr_gat_ad(bsr: BSRMatrix, er: jax.Array, el: jax.Array, h: jax.Array, *,
               negative_slope: float = 0.2, act: str = "leaky_relu") -> jax.Array:
    """Differentiable fused GAT: flash-style Pallas kernels both ways — the
    forward saves the per-row softmax stats and the backward is one streaming
    pass over the tiles (:func:`bsr_gat_grads`); the attention matrix never
    materializes in HBM in either direction."""
    return _bsr_gat_core(bsr.blocks, bsr.block_rows, bsr.block_cols,
                         (er, el, h), bsr.shape, negative_slope, act)


def rcm_reorder(adj: sp.spmatrix):
    """Reverse-Cuthill-McKee permutation concentrating nnz into fewer tiles.

    Returns (permutation, reordered_adj). Apply the same permutation to node
    features/labels; RCM banding cuts the BSR tile count on kNN/spatial graphs
    (measured ~2× fewer kernel-time on k=15 kNN graphs).
    """
    from scipy.sparse.csgraph import reverse_cuthill_mckee
    adj = sp.csr_matrix(adj)
    perm = reverse_cuthill_mckee(adj, symmetric_mode=True)
    return perm, adj[perm][:, perm]


def bsr_with_rcm(adj: sp.spmatrix, block: int = BLOCK):
    """RCM-reorder a (square) adjacency and tile it to BSR in one step.

    Returns ``(perm, bsr)`` where ``bsr`` covers ``adj[perm][:, perm]``.
    Callers must apply the same ``perm`` to node features/labels and invert
    it on any per-node outputs (``out_orig[perm] = out``).
    """
    perm, adj_p = rcm_reorder(adj)
    return np.asarray(perm), bsr_from_scipy(adj_p, block=block)


class BipartiteBSR(NamedTuple):
    """A bipartite adjacency tiled both ways for alternating message passing.

    ``fwd`` is the (rows × cols) matrix, ``bwd`` its transpose — both BSR, so
    A @ H and Aᵀ @ H each run as one forward Pallas SpMM (the kernel needs
    block_rows sorted, which a shared tiling can't provide for both
    directions; two host-side tilings do).
    """

    fwd: "BSRMatrix"
    bwd: "BSRMatrix"


def bipartite_bsr(adj: sp.spmatrix, block: int = BLOCK) -> BipartiteBSR:
    """Tile a (rectangular) scipy adjacency and its transpose to BSR."""
    adj = sp.csr_matrix(adj)
    return BipartiteBSR(bsr_from_scipy(adj, block=block),
                        bsr_from_scipy(adj.T.tocsr(), block=block))


def tile_expansion(adj: sp.spmatrix, block: int = BLOCK) -> float:
    """Dense-slot-per-nnz ratio of the BSR tiling: nonzero_tiles·block² / nnz.

    The BSR kernel streams every touched tile densely, so this is its FLOP/IO
    overhead vs a perfect sparse kernel. Measured crossover on v5e: banded
    kNN/spatial graphs at expansion ~60 win 3-14× over the CSR segment path;
    unbanded graphs at expansion ~1000 lose to it."""
    coo = sp.coo_matrix(adj)
    if coo.nnz == 0:
        return float("inf")
    tiles = len({(r, c) for r, c in zip(coo.row // block, coo.col // block)})
    return tiles * block * block / coo.nnz


def resolve_use_bsr(use_bsr, adj: sp.spmatrix, block: int = BLOCK, *,
                    max_expansion: float = 150.0, reorder: bool = True) -> bool:
    """Resolve a ``use_bsr="auto"`` flag to a concrete bool.

    ``True``/``False`` pass through. ``"auto"`` picks the Pallas path exactly
    when it wins: on TPU (off-TPU the kernel would run in interpreter mode)
    AND when the (RCM-banded, unless ``reorder=False``) tiling's
    :func:`tile_expansion` stays under ``max_expansion`` — high-expansion
    tilings lose to XLA's segment ops (BENCH_NOTES.md).
    """
    if use_bsr != "auto":
        return bool(use_bsr)
    import jax
    if jax.default_backend() != "tpu":
        return False
    adj = sp.csr_matrix(adj)
    if reorder:
        _, adj = rcm_reorder(adj)
    return tile_expansion(adj, block) <= max_expansion


def choose_adj_format(adj: sp.spmatrix, block: int = BLOCK, *,
                      max_expansion: float = 150.0, reorder: bool = True,
                      dense_threshold: float = 0.02,
                      dense_occupancy: float = 0.25,
                      dense_max_bytes: int = 2 << 30) -> str:
    """Pick the device adjacency format: ``"dense"`` | ``"bsr"`` | ``"csr"``.

    TPU-first dispatch by cost, not just density:

    - density ≥ ``dense_threshold`` (and the dense operand fits in
      ``dense_max_bytes``): a plain MXU matmul beats every sparse format —
      the BSR grid is fully populated at that density and the CSR
      gather/segment path materializes an nnz×d message tensor (OOM past
      ~10M edges).
    - Otherwise compare the BSR tiling's actual work against dense: the
      kernel streams ``tile_expansion·nnz`` dense slots, so when that covers
      ≥ ``dense_occupancy`` of the full n·m matrix the Pallas grid is doing
      near-dense FLOPs *plus* per-tile overhead — the plain matmul wins even
      though the raw density looked sparse (e.g. stdGCN's MNN-coupled towers:
      0.9% density but 102× expansion ⇒ 96% tile occupancy).
    - Below that, BSR vs CSR is :func:`resolve_use_bsr`'s rule: Pallas when
      the (optionally RCM-banded) tiling stays under ``max_expansion``
      dense-slots-per-nnz, XLA segment ops otherwise.

    Off-TPU always resolves to ``"csr"``.
    """
    import jax
    if jax.default_backend() != "tpu":
        return "csr"
    adj = sp.csr_matrix(adj)
    n, m = adj.shape
    density = adj.nnz / max(n * m, 1)
    dense_fits = 4 * n * m <= dense_max_bytes
    if density >= dense_threshold and dense_fits:
        return "dense"
    if reorder:
        _, adj = rcm_reorder(adj)
    expansion = tile_expansion(adj, block)
    if dense_fits and expansion * density >= dense_occupancy:
        return "dense"
    return "bsr" if expansion <= max_expansion else "csr"


def unpermute(perm, arr: np.ndarray) -> np.ndarray:
    """Undo a node permutation on per-node output rows (``out[perm] = arr``).

    No-op when ``perm`` is None, so callers can apply it unconditionally."""
    if perm is None:
        return arr
    out = np.empty_like(arr)
    out[np.asarray(perm)] = arr
    return out


# --------------------------------------------------------------------------
# Max aggregation over BSR tiles
# --------------------------------------------------------------------------
#
# DGL's u_mul_e/max reduction (max-pooling GraphSAGE variants) has no matmul
# formulation: out[i,k] = max_{j in N(i)} a_ij * h[j,k].  On BSR tiles the
# nonzero pattern is recoverable from the dense tile (a zero slot means "no
# edge"; real zero-weight edges are indistinguishable and treated as absent —
# the CSR segment path keeps the exact pattern if that matters).  The kernel
# streams the same tiles as the sum kernel but runs a masked max-reduction on
# the VPU: per tile it expands column-chunks of A against B and folds them
# into the running row-max, so the (BLOCK, BLOCK, d) message tensor never
# exists outside an 8-column chunk of VMEM.  Empty rows finish at -inf,
# matching jax.ops.segment_max's identity.

_MAX_CHUNK = 8


def _spmm_max_kernel(brows_ref, bcols_ref, blocks_ref, b_ref, out_ref, *,
                     weighted: bool):
    i = pl.program_id(1)  # block index (innermost: consecutive same-row visits)

    @pl.when((i == 0) | (brows_ref[i] != brows_ref[jnp.maximum(i - 1, 0)]))
    def _():
        out_ref[:] = jnp.full_like(out_ref, -jnp.inf)

    a = blocks_ref[0]  # (BLOCK, BLOCK)
    b = b_ref[:]       # (BLOCK, d_tile)
    acc = out_ref[:]
    for c0 in range(0, BLOCK, _MAX_CHUNK):
        asub = a[:, c0:c0 + _MAX_CHUNK]                    # (BLOCK, CH)
        bsub = b[c0:c0 + _MAX_CHUNK, :]                    # (CH, d_tile)
        msg = asub[:, :, None] * bsub[None, :, :] if weighted \
            else jnp.broadcast_to(bsub[None, :, :], (BLOCK,) + bsub.shape)
        msg = jnp.where(asub[:, :, None] != 0, msg, -jnp.inf)
        acc = jnp.maximum(acc, msg.max(axis=1))
    out_ref[:] = acc


@partial(jax.jit, static_argnames=("weighted", "d_tile", "interpret"))
def bsr_spmm_max(bsr: BSRMatrix, b: jax.Array, *, weighted: bool = True,
                 d_tile: int = 128, interpret: bool = None) -> jax.Array:
    """``out[i] = max_j (A_ij * B[j])`` over the BSR nonzero pattern.

    ``weighted=False`` maxes the raw neighbor features instead.  Rows with no
    edges come back -inf (the segment_max identity).  Forward-only: max
    aggregation is not on any model's training path (no custom VJP —
    differentiating through it raises loudly rather than silently degrading).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_rows, n_cols = bsr.shape
    d = b.shape[1]
    dp = -(-d // d_tile) * d_tile
    if b.shape != (n_cols, dp):
        b = jnp.pad(b, ((0, n_cols - b.shape[0]), (0, dp - d)))
    grid = (dp // d_tile, bsr.nb)
    out = pl.pallas_call(
        partial(_spmm_max_kernel, weighted=weighted),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, BLOCK, BLOCK), lambda j, i, brows, bcols: (i, 0, 0)),
                pl.BlockSpec((BLOCK, d_tile), lambda j, i, brows, bcols: (bcols[i], j)),
            ],
            out_specs=pl.BlockSpec((BLOCK, d_tile),
                                   lambda j, i, brows, bcols: (brows[i], j)),
        ),
        out_shape=jax.ShapeDtypeStruct((n_rows, dp), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * bsr.nb * BLOCK * BLOCK * dp,
            bytes_accessed=bsr.nb * BLOCK * BLOCK * 4 + n_cols * dp * 4,
            transcendentals=0,
        ),
    )(bsr.block_rows, bsr.block_cols, bsr.blocks, b)
    return out[:, :d]

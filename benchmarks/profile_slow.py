"""Decompose the slow BENCH_MATRIX rows into per-phase on-chip timings.

For each target model this times, with host-synced dependent chains:
- the jitted training step alone (N calls, one final device->host sync),
- any per-epoch auxiliary work the fit loop does (encode/soft-assign,
  host pulls), isolating where the wall time actually goes.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/profile_slow.py sctag
"""

import sys
import time

import numpy as np


def sync(x):
    import jax
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf).ravel()[:1]


def timeit(fn, n=20, label=""):
    fn()  # warm
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn()
    sync(out)
    per = (time.perf_counter() - t0) / n
    print(f"  {label}: {per * 1e3:.1f} ms/call (n={n})", flush=True)
    return per


def profile_sctag():
    import jax.numpy as jnp

    from benchmarks.matrix import N_CELLS, N_GENES, N_TYPES, _clustering_inputs, _knn_csr
    from dance_tpu.modules.single_modality.clustering import ScTAG
    from dance_tpu.utils.loss import soft_assign, target_distribution

    (xl, x, sf_np), y = _clustering_inputs()
    adj = _knn_csr(xl[:, :64])
    m = ScTAG(n_clusters=N_TYPES, seed=0)
    m.fit((adj, xl, x, sf_np), y, epochs=2, pretrain_epochs=2, use_bsr=False)

    xj = jnp.asarray(xl, jnp.float32)
    xrj = jnp.asarray(x, jnp.float32)
    sf = jnp.asarray(x.sum(1) / np.median(x.sum(1)), jnp.float32)
    import optax
    m._tx = optax.adam(5e-4)
    opt_state = m._tx.init((m.params, m.mu))
    p = jnp.full((N_CELLS, N_TYPES), 1.0 / N_TYPES, jnp.float32)

    params, mu = m.params, m.mu

    def step():
        nonlocal params, mu, opt_state
        params, mu, opt_state, loss = m._step(
            params, mu, opt_state, m.adj_n, xj, xrj, sf, m.adj_dense, p,
            0.3, 1.0, 1.5, 0.0, True, 0.5, 20.0)
        return loss

    timeit(step, 20, "train step (full loss)")

    def enc():
        z = m._encode(params, m.adj_n, xj)
        q = soft_assign(z, mu, 1.0)
        return target_distribution(q)

    timeit(enc, 20, "encode + soft_assign + p")

    def enc_pull():
        z = m._encode(params, m.adj_n, xj)
        q = soft_assign(z, mu, 1.0)
        return np.asarray(q.argmax(1))

    timeit(enc_pull, 10, "encode + argmax host pull")


def profile_graphsci():
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp

    from benchmarks.matrix import N_CELLS, N_GENES, _expr
    from dance_tpu.graph import Graph
    from dance_tpu.modules.single_modality.imputation import GraphSCI

    x, _ = _expr()
    xl = np.log1p(x)
    corr = np.corrcoef(xl[:2000].T)
    adj = sp.csr_matrix((np.abs(corr) > 0.3).astype(np.float32))
    deg = np.asarray(adj.sum(1)).ravel()
    dinv = sp.diags(1.0 / np.sqrt(np.maximum(deg, 1e-12)))
    g = Graph(sp.csr_matrix(dinv @ adj @ dinv))
    print(f"  gene graph nnz: {g.adj.nnz}", flush=True)

    m = GraphSCI(num_cells=N_CELLS, num_genes=N_GENES, n_epochs=2, seed=0)
    m.fit(g, xl, x)
    dg, gene_feat, xj, sf = m._cache
    xrj = jnp.asarray(x)
    maskj = jnp.ones_like(xj)
    import optax
    m._tx = optax.adamw(1e-3, weight_decay=1e-5)
    opt_state = m._tx.init(m.params)
    params = m.params
    key = jax.random.key(0)

    def step():
        nonlocal params, opt_state, key
        key, sk = jax.random.split(key)
        params, opt_state, loss = m._step(params, opt_state, dg.adj, gene_feat,
                                          xj, xrj, sf, m._adj_target
                                          if hasattr(m, "_adj_target") else
                                          jnp.asarray((np.asarray(g.adj.todense()) > 0).astype(np.float32)),
                                          maskj, sk, 1.0, 1.0, 1.0, 1.0)
        return loss

    timeit(step, 10, "train step")


def profile_stdgcn():
    import jax
    import jax.numpy as jnp

    from benchmarks.matrix import N_CT, N_PSEUDO, _deconvo_inputs
    from dance_tpu.modules.spatial.cell_type_deconvo import StdGCN

    profiles, portions, x_mix, coords, rng = _deconvo_inputs()
    ps_port = rng.dirichlet(np.ones(N_CT), N_PSEUDO)
    ps_x = rng.poisson(ps_port @ profiles * 3).astype(np.float32)
    feats = np.log1p(np.concatenate([ps_x, x_mix], axis=0))
    y = np.concatenate([ps_port, np.zeros_like(portions)], axis=0)

    m = StdGCN(seed=0)
    t0 = time.perf_counter()
    m.fit((feats, coords), y, max_epochs=5, early_stopping_patience=0,
          use_bsr=True)
    print(f"  5-epoch fit total: {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    m.fit((feats, coords), y, max_epochs=55, early_stopping_patience=0,
          use_bsr=True)
    print(f"  55-epoch fit total: {time.perf_counter() - t0:.1f}s", flush=True)


def profile_stdgcn_formats():
    """Adjacency-format shootout for the two-tower conGCN: the bench row
    pins use_bsr=True; at 5k nodes / kNN density ~0.5% the right format is
    not obvious (BSR tile overhead vs CSR gathers vs one dense matmul)."""
    import time as _t

    from benchmarks.matrix import N_CT, N_PSEUDO, _deconvo_inputs
    from dance_tpu.modules.spatial.cell_type_deconvo import StdGCN

    profiles, portions, x_mix, coords, rng = _deconvo_inputs()
    ps_port = rng.dirichlet(np.ones(N_CT), N_PSEUDO)
    ps_x = rng.poisson(ps_port @ profiles * 3).astype(np.float32)
    feats = np.log1p(np.concatenate([ps_x, x_mix], axis=0))
    y = np.concatenate([ps_port, np.zeros_like(portions)], axis=0)

    for fmt in (True, False, "auto"):
        m = StdGCN(seed=0)

        def make(e):
            m.fit((feats, coords), y, max_epochs=e,
                  early_stopping_patience=0, use_bsr=fmt)

        make(5)  # compile
        t0 = _t.perf_counter()
        make(5)
        small = _t.perf_counter() - t0
        t0 = _t.perf_counter()
        make(55)
        big = _t.perf_counter() - t0
        print(f"  use_bsr={fmt!r}: {(big - small) / 50 * 1e3:.1f} ms/epoch "
              f"(5ep {small:.1f}s / 55ep {big:.1f}s)", flush=True)


def profile_deepimpute():
    """Step isolation for the vmapped ensemble: where do 130 ms/epoch go —
    the per-batch scan (dispatch-free, so per-step kernel overheads), the
    gathers, or the Adam update over the stacked params?"""
    import jax
    import jax.numpy as jnp
    import optax

    from benchmarks.matrix import _expr
    from dance_tpu.modules.single_modality.imputation import DeepImpute
    from dance_tpu.utils import to_device

    x, _ = _expr()
    xl = np.log1p(x)
    # build predictors/targets exactly like GeneHoldout.__call__
    rng = np.random.default_rng(0)
    n_genes = xl.shape[1]
    targets = np.split(rng.permutation(n_genes),
                       range(512, n_genes, 512))
    cov = np.cov(xl.astype(np.float64), rowvar=False)
    predictors = []
    for targs in targets:
        others = np.setdiff1d(np.arange(n_genes), targs)
        order = np.argsort(-cov[np.ix_(targs, others)], axis=1)[:, :5]
        predictors.append(np.unique(others[order.ravel()]))
    m = DeepImpute(predictors, targets, seed=0)
    m.fit(xl, xl, n_epochs=2, patience=0, batch_size=64)

    Xj = to_device(xl)
    keys = jax.random.split(jax.random.key(1), 64)
    params, opt_state = m.params, m._tx.init(m.params)

    n_ens = len(targets)
    print(f"  ensembles: {n_ens}, p_max {m._idx[0].shape[1]}, "
          f"t_max {m._idx[1].shape[1]}", flush=True)

    i = [0]

    def one_epoch():
        nonlocal params, opt_state
        params, opt_state, loss = m._train_epoch(
            params, opt_state, Xj, Xj, jnp.ones_like(Xj), keys[i[0] % 64], 64)
        i[0] += 1
        return loss

    timeit(one_epoch, 10, "per-epoch batch scan (bs=64)")

    def one_epoch_big():
        nonlocal params, opt_state
        params, opt_state, loss = m._train_epoch(
            params, opt_state, Xj, Xj, jnp.ones_like(Xj), keys[i[0] % 64],
            1024)
        i[0] += 1
        return loss

    timeit(one_epoch_big, 10, "per-epoch batch scan (bs=1024)")


PROFILES = {"sctag": profile_sctag, "graphsci": profile_graphsci,
            "stdgcn": profile_stdgcn, "stdgcn_formats": profile_stdgcn_formats,
            "deepimpute": profile_deepimpute}

if __name__ == "__main__":
    for name in sys.argv[1:] or sorted(PROFILES):
        print(f"== {name}", flush=True)
        PROFILES[name]()

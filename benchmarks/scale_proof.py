"""100k-cell scale proofs (BENCH_NOTES.md §scale).

``--model scdeepsort`` (default) trains the flagship GNN full-graph on a
100k cells × 2k genes synthetic bipartite expression graph (fixed 50-gene
fanout, ~10M directed edges) on the single v5e chip, recording graph/tiling
stats, one-time compile wall time, and steady-state step time.

``--model dcca|jae|scmogcn`` are the reference's OWN documented scale
failures — DCCA OOMs past 64 GB host RAM and JAE/scMoGNN take ~1 h on a V100
(reference tests/test_bench.py:16-20) — trained here at 100k × 2k on one
chip, reporting ms/epoch and peak HBM.

The steady-state numbers come from host-synced epoch deltas at two epoch
counts (uploads and compile cancel) or a dependent jitted-step chain with one
final device→host sync — ``jax.block_until_ready`` returns optimistically on
the axon relay.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/scale_proof.py \
           [--model dcca] [--cells 100000]
"""

import argparse
import time

import numpy as np
import scipy.sparse as sp


def _peak_hbm():
    import jax
    try:
        stats = jax.local_devices()[0].memory_stats()
        return f"{stats['peak_bytes_in_use'] / 1e9:.2f} GB peak HBM"
    except Exception:  # noqa: BLE001 — the axon relay may not expose stats
        return "peak HBM unavailable via relay"


def _epoch_delta_fit(make_fit, e_small, e_big, sync, reps=2):
    make_fit(e_small)  # compile + caches
    smalls, bigs = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(make_fit(e_small))
        smalls.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        sync(make_fit(e_big))
        bigs.append(time.perf_counter() - t0)
    per = (min(bigs) - min(smalls)) / (e_big - e_small)
    return per if per > 0 else min(bigs) / e_big


def _sync_params(m):
    import jax
    tree = next(getattr(m, a) for a in ("params", "params1")
                if getattr(m, a, None) is not None)
    float(np.asarray(jax.tree_util.tree_leaves(tree)[0]).ravel()[0])
    return m


def run_mm_model(args):
    """DCCA / JAE / scMoGNN joint-embedding at 100k x 2k (+134-dim mod2)."""
    import jax

    rng = np.random.default_rng(0)
    n, g, d2 = args.cells, args.genes, 134
    # low-rank count structure so the models train on realistic signal
    z = rng.normal(0, 1, (n, 8)).astype(np.float32)
    x1 = rng.poisson(np.exp(np.clip(z @ rng.normal(0, 0.4, (8, g)), -2, 2))
                     ).astype(np.float32)
    x2 = rng.poisson(np.exp(np.clip(z @ rng.normal(0, 0.4, (8, d2)), -2, 2))
                     ).astype(np.float32)
    print(f"data: {n:,} x {g:,} + {d2} (mod1 nnz frac "
          f"{(x1 > 0).mean():.2f})", flush=True)

    if args.model == "dcca":
        from dance_tpu.modules.multi_modality.joint_embedding import DCCA
        m = DCCA(Type_2="NB", seed=0)
        lx1 = np.log1p(x1)

        def make(e):
            m.fit(lx1, np.log1p(x2), x_mod2_raw=x2, epochs=e,
                  batch_size=args.batch_size)
            return m
    elif args.model == "jae":
        from dance_tpu.modules.multi_modality.joint_embedding import JAEWrapper
        m = JAEWrapper(seed=0)
        ct = rng.integers(0, 8, n)

        def make(e):
            m.fit(np.log1p(x1), np.log1p(x2), cell_type=ct, epochs=e,
                  batch_size=args.batch_size)
            return m
    elif args.model == "scmogcn":
        from dance_tpu.modules.multi_modality.joint_embedding import (
            ScMoGCNWrapper)
        m = ScMoGCNWrapper(seed=0)
        ct = rng.integers(0, 8, n)

        def make(e):
            m.fit(np.log1p(x1), np.log1p(x2), cell_type=ct, epochs=e)
            return m
    else:
        raise SystemExit(f"unknown --model {args.model}")

    t0 = time.perf_counter()
    _sync_params(make(2))
    print(f"first fit (compile + upload + 2 epochs): "
          f"{time.perf_counter() - t0:.1f}s", flush=True)
    per = _epoch_delta_fit(make, 2, args.steps + 2, _sync_params)
    print(f"steady state: {per * 1e3:.1f} ms/epoch "
          f"({args.cells / per:,.0f} cells/s); {_peak_hbm()}", flush=True)


def run_family_model(args):
    """Zoo-wide 100k lane: one representative per remaining family
    (VERDICT r4 item 6) — clustering ZINB-AE (scDeepCluster), imputation
    (DeepImpute), spatial GNN (STAGATE), deconvolution (SpatialDecon)."""
    rng = np.random.default_rng(0)
    n, g = args.cells, args.genes
    z = rng.normal(0, 1, (n, 8)).astype(np.float32)
    x = rng.poisson(np.exp(np.clip(z @ rng.normal(0, 0.4, (8, g)), -2, 2))
                    ).astype(np.float32)
    xl = np.log1p(x)
    print(f"data: {n:,} x {g:,} (nnz frac {(x > 0).mean():.2f})", flush=True)

    if args.model == "scdeepcluster":
        from dance_tpu.modules.single_modality.clustering import ScDeepCluster
        sf = x.sum(1) / np.median(x.sum(1))
        m = ScDeepCluster(input_dim=g, z_dim=32, seed=0)

        def make(e):
            # DEC epochs measured; pretrain pinned at 2 (cancels in deltas)
            m.fit((xl, x, sf), None, n_clusters=8, epochs=e, pt_epochs=2,
                  batch_size=args.batch_size, pt_batch_size=args.batch_size)
            return m
    elif args.model == "deepimpute":
        from dance_tpu.modules.single_modality.imputation import DeepImpute
        var = xl.var(0)
        targets = [np.arange(i, min(i + 512, g)) for i in range(0, g, 512)]
        predictors = []
        for t in targets:
            rest = np.setdiff1d(np.arange(g), t)
            predictors.append(rest[np.argsort(-var[rest])][:512])
        m = DeepImpute(predictors, targets, sub_outputdim=512, hidden_dim=256,
                       seed=0)

        def make(e):
            m.fit(xl, xl, n_epochs=e, batch_size=args.batch_size, patience=0)
            return m
    elif args.model == "stagate":
        from dance_tpu.modules.spatial.spatial_domain import Stagate
        from dance_tpu.ops.neighbors import knn_graph
        coords = rng.random((n, 2)).astype(np.float32) * 100
        t0 = time.perf_counter()
        adj = knn_graph(coords, 8, include_self=False)
        print(f"kNN graph: {adj.nnz:,} edges ({time.perf_counter() - t0:.1f}s)",
              flush=True)
        m = Stagate(hidden_dims=(g, 512, 30), seed=0)

        def make(e):
            m.fit((xl, adj), epochs=e, n_clusters=7, use_bsr=True)
            return m
    elif args.model == "spatialdecon":
        from dance_tpu.modules.spatial.cell_type_deconvo import SpatialDecon
        profiles = np.stack([x[(i * n) // 8:((i + 1) * n) // 8].mean(0)
                             for i in range(8)])
        m = SpatialDecon(ct_profile=profiles.T, ct_select=list(range(8)))

        def make(e):
            m.fit(x, lr=1e-2, max_iter=e)
            return m
    else:
        raise SystemExit(f"unknown --model {args.model}")

    def sync(m):
        import jax
        tree = next((getattr(m, a) for a in ("params", "weights")
                     if getattr(m, a, None) is not None), None)
        leaf = jax.tree_util.tree_leaves(tree)[0]
        float(np.asarray(leaf).ravel()[0])
        return m

    t0 = time.perf_counter()
    sync(make(2))
    print(f"first fit (compile + upload + 2 epochs): "
          f"{time.perf_counter() - t0:.1f}s", flush=True)
    per = _epoch_delta_fit(make, 2, args.steps + 2, sync)
    print(f"steady state: {per * 1e3:.1f} ms/epoch "
          f"({args.cells / per:,.0f} cells/s); {_peak_hbm()}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="scdeepsort",
                    choices=["scdeepsort", "dcca", "jae", "scmogcn",
                             "scdeepcluster", "deepimpute", "stagate",
                             "spatialdecon"])
    ap.add_argument("--cells", type=int, default=100_000)
    ap.add_argument("--genes", type=int, default=2_000)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--fanout", type=int, default=50)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch_size", type=int, default=4096)
    args = ap.parse_args()

    if args.model in ("dcca", "jae", "scmogcn"):
        run_mm_model(args)
        return
    if args.model != "scdeepsort":
        run_family_model(args)
        return

    import jax
    import jax.numpy as jnp
    import optax

    from dance_tpu.graph import Graph
    from dance_tpu.modules.single_modality.cell_type_annotation import ScDeepSort

    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    # fixed-fanout expression rows: equivalent workload to density
    # fanout/genes, built in seconds instead of sp.random's minutes at 5M nnz
    indices = rng.integers(0, args.genes, (args.cells, args.fanout),
                           dtype=np.int32).ravel()
    indptr = np.arange(args.cells + 1, dtype=np.int64) * args.fanout
    data = rng.random(args.cells * args.fanout, dtype=np.float32) + 0.1
    expr = sp.csr_matrix((data, indices, indptr),
                         shape=(args.cells, args.genes))
    expr.sum_duplicates()
    g = Graph.from_cell_feature_matrix(
        expr, rng.random((args.cells, args.dim), dtype=np.float32),
        rng.random((args.genes, args.dim), dtype=np.float32))
    labels = rng.integers(0, 8, args.cells)
    t_build = time.perf_counter() - t0
    print(f"graph: {g.num_nodes:,} nodes, {g.num_edges:,} edges "
          f"(build {t_build:.1f}s)", flush=True)

    t0 = time.perf_counter()
    conv_adj = g.to_adaptive_bsr(block=128)
    nb = int(conv_adj.bsr.nb)
    t_tile = time.perf_counter() - t0
    print(f"AdaptiveBSR tiling: {t_tile:.1f}s, {nb:,} tiles "
          f"({nb * 128 * 128 * 4 / 1e9:.2f} GB tile storage)", flush=True)

    m = ScDeepSort(dim_in=args.dim, dim_hid=args.dim, num_layers=2, seed=0)
    t0 = time.perf_counter()
    m.fit(g, labels, epochs=1, val_ratio=0.0, use_bsr=True)
    t_first = time.perf_counter() - t0
    # real sync: device->host read of a trained weight
    float(np.asarray(jax.tree_util.tree_leaves(m.params)[0]).sum())
    print(f"first fit (compile + upload + 1 epoch): {t_first:.1f}s", flush=True)

    # steady state: drive the jitted step directly, dependent chain, one sync
    dg, gene_id = m._graph_cache
    num_genes = int(g.info["num_genes"])
    full_labels = -np.ones(g.num_nodes, dtype=np.int32)
    full_labels[num_genes:] = labels
    full_labels = jnp.asarray(full_labels)
    train_mask = jnp.asarray((np.arange(g.num_nodes) >= num_genes)
                             .astype(np.float32))
    feats = dg.ndata["features"]
    tx = optax.adam(1e-3)
    params = m.params
    opt_state = tx.init(params)
    m._tx = tx
    key = jax.random.key(0)

    def chain(n):
        nonlocal params, opt_state, key
        for _ in range(n):
            key, sk = jax.random.split(key)
            params, opt_state, loss = m._train_step(
                params, opt_state, conv_adj, feats, gene_id, full_labels,
                train_mask, sk, None)
        float(np.asarray(loss))  # host sync

    chain(2)  # warm (trace-cache hit; compile already done in fit)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        chain(args.steps)
        best = min(best, (time.perf_counter() - t0) / args.steps)
    print(f"steady state: {best * 1e3:.1f} ms/epoch "
          f"({args.cells / best:,.0f} cells/s) [min of 3x{args.steps} steps]",
          flush=True)


if __name__ == "__main__":
    main()

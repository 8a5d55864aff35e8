"""100k-cell flagship scale proof (BENCH_NOTES.md §scale).

Trains scDeepSort full-graph on a 100k cells × 2k genes synthetic bipartite
expression graph on the single v5e chip, recording graph/tiling stats,
one-time compile wall time, and steady-state epoch time (host-synced epoch
delta). The reference's own envelope notes OOM/hour-scale runs past ~100k
cells on a V100 (reference tests/test_bench.py:16-20).

Usage: PYTHONPATH=/root/repo python benchmarks/scale_proof.py [--cells 100000]
"""

import argparse
import time

import numpy as np
import scipy.sparse as sp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, default=100_000)
    ap.add_argument("--genes", type=int, default=2_000)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--density", type=float, default=0.025)
    ap.add_argument("--use_bsr", default="true")
    args = ap.parse_args()

    import jax

    from dance_tpu.graph import Graph
    from dance_tpu.modules.single_modality.cell_type_annotation import ScDeepSort

    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    expr = sp.random(args.cells, args.genes, density=args.density,
                     random_state=0, dtype=np.float32, format="csr")
    g = Graph.from_cell_feature_matrix(
        expr, rng.random((args.cells, args.dim), dtype=np.float32),
        rng.random((args.genes, args.dim), dtype=np.float32))
    labels = rng.integers(0, 8, args.cells)
    t_build = time.perf_counter() - t0
    print(f"graph: {g.num_nodes:,} nodes, {g.num_edges:,} edges "
          f"(build {t_build:.1f}s)", flush=True)

    use_bsr = args.use_bsr.lower() in ("1", "true", "yes")
    if use_bsr:
        from dance_tpu.ops.pallas_kernels import bsr_from_scipy
        nb = bsr_from_scipy(sp.csr_matrix(g.adj)).nb
        print(f"BSR tiling: {nb:,} nonzero 128x128 tiles "
              f"({nb * 128 * 128 * 4 / 1e9:.2f} GB tile storage)", flush=True)

    def fit(epochs):
        m = ScDeepSort(dim_in=args.dim, dim_hid=args.dim, num_layers=2, seed=0)
        m.fit(g, labels, epochs=epochs, val_ratio=0.0, use_bsr=use_bsr)
        # real sync: device->host read of a trained weight
        float(np.asarray(jax.tree_util.tree_leaves(m.params)[0]).sum())
        return m

    t0 = time.perf_counter()
    fit(1)
    t_compile = time.perf_counter() - t0
    print(f"first fit (compile + upload): {t_compile:.1f}s", flush=True)

    base, extra = 3, 30
    t0 = time.perf_counter()
    fit(base)
    t_small = time.perf_counter() - t0
    t0 = time.perf_counter()
    fit(base + extra)
    t_big = time.perf_counter() - t0
    per_epoch = (t_big - t_small) / extra
    print(f"steady state: {per_epoch * 1e3:.1f} ms/epoch "
          f"({args.cells / per_epoch:,.0f} cells/s) "
          f"[small {t_small:.1f}s big {t_big:.1f}s]", flush=True)


if __name__ == "__main__":
    main()

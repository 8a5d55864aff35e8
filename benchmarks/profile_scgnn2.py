"""Per-stage wall-clock split of the ScGNN2 EM loop at bench scale.

VERDICT r4 item 3: the scgnn2 row ran 30.5 s/EM-iter for 7.8 TFLOP (~1.3% of
f32 peak) with no evidence of WHERE the time goes.  This instruments the fit
stages (feature AE epochs, device kNN + graph AE, Louvain labels, cluster-AE
pad/train/scatter) with host-sync timers so the row's bound analysis in
BENCH_NOTES.md is measured, not asserted.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/profile_scgnn2.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 1)[0])


def main():
    import jax
    import jax.numpy as jnp

    from matrix import _expr, N_CELLS, N_GENES
    from dance_tpu.modules.single_modality.imputation import ScGNN2
    from dance_tpu.ops.neighbors import knn_graph

    x, _ = _expr()
    xl = np.log1p(x).astype(np.float32)
    m = ScGNN2(total_epoch=1, feature_epoch=20, graph_epoch=20,
               cluster_epoch=20, seed=0)

    # monkey-patch timers around the fit stages
    times = {}

    def timed(name, fn):
        def wrap(*a, **k):
            t0 = time.perf_counter()
            out = fn(*a, **k)
            # host sync: touch one device leaf if present
            for leaf in jax.tree_util.tree_leaves(out):
                if isinstance(leaf, jax.Array):
                    float(np.asarray(leaf).ravel()[0])
                    break
            times[name] = times.get(name, 0.0) + time.perf_counter() - t0
            return out
        return wrap

    m._cluster_labels = timed("labels(louvain)", m._cluster_labels)
    m._cluster_ae_stage = timed("cluster_ae", m._cluster_ae_stage)

    import dance_tpu.modules.single_modality.imputation.scgnn2 as mod
    orig_knn = knn_graph

    def knn_timed(*a, **k):
        t0 = time.perf_counter()
        out = orig_knn(*a, **k)
        times["knn_graph"] = times.get("knn_graph", 0.0) + (
            time.perf_counter() - t0)
        return out

    # fit() imports knn_graph from ops.neighbors at call time
    import dance_tpu.ops.neighbors as nb
    nb.knn_graph = knn_timed

    for label in ("cold (compiles)", "warm"):
        times.clear()
        t0 = time.perf_counter()
        m.fit(xl)
        total = time.perf_counter() - t0
        print(f"{label} fit ({N_CELLS}x{N_GENES}, 1 EM iter, 20 ep/stage): "
              f"{total:.1f}s")
        accounted = sum(times.values())
        for k, v in sorted(times.items(), key=lambda kv: -kv[1]):
            print(f"  {k:>18}: {v:6.1f}s ({100 * v / total:.0f}%)")
        print(f"  {'feature+graph AE':>18}: {total - accounted:6.1f}s "
              f"({100 * (total - accounted) / total:.0f}%)  [residual: "
              f"stage scans + final applies]")
    nb.knn_graph = orig_knn


if __name__ == "__main__":
    main()

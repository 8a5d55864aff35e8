"""Component benchmarks: dance-tpu (TPU) vs the reference's technology stack
(torch/sklearn/scipy on this host's CPU).

Prints a markdown table; re-run any time with
``PYTHONPATH=/root/repo python benchmarks/compare.py``.

Methodology: every TPU timing ends in an actual device->host read (the axon
relay's ``block_until_ready`` can return optimistically — BENCH_NOTES.md).
Inputs are device-resident, matching pipeline use where data stays on chip
between ops; the one-time host->device transfer (~18 MB/s over the relay
tunnel) is excluded and noted where it matters. MLP training uses the same
host-synced epoch-delta as bench.py.
"""

import time

import numpy as np


def hostread(out):
    """Force completion by pulling the result to the host.

    ``jax.block_until_ready`` can return optimistically on the axon relay
    (see BENCH_NOTES.md); an actual device->host transfer cannot.
    """
    import jax
    leaves = [x for x in jax.tree_util.tree_leaves(out)
              if hasattr(x, "dtype") and hasattr(x, "sum")]
    for x in leaves[:1]:
        np.asarray(x).ravel()[:1]


def timeit(fn, *args, warmup: int = 1, reps: int = 3, block=hostread):
    for _ in range(warmup):
        out = fn(*args)
        if block:
            block(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        if block:
            block(out)
    return (time.perf_counter() - t0) / reps


def bench_mlp_training(rows):
    import jax

    from dance_tpu.modules.single_modality.cell_type_annotation import ACTINN
    n, g, c = 5000, 2000, 8
    rng = np.random.default_rng(0)
    x = rng.random((n, g), dtype=np.float32)
    y = np.eye(c, dtype=np.float32)[rng.integers(0, c, n)]

    model = ACTINN(hidden_dims=(100, 50, 25), random_seed=0)
    model.fit(x, y, num_epochs=1, batch_size=128, seed=0)
    hostread(model.params)
    # steady-state via host-synced epoch delta (upload cost cancels; see bench.py);
    # the delta must be large (500 epochs) so it dominates upload-time jitter
    def fit_epochs(e):
        t0 = time.perf_counter()
        model.fit(x, y, num_epochs=e, batch_size=128, seed=0)
        hostread(model.params)
        return time.perf_counter() - t0
    fit_epochs(50)
    deltas = [fit_epochs(550) - fit_epochs(50) for _ in range(3)]
    t_tpu = float(np.median(deltas)) / 500 * 5  # per-5-epoch steady-state time

    import torch
    import torch.nn as nn
    net = nn.Sequential(nn.Linear(g, 100), nn.ReLU(), nn.Linear(100, 50), nn.ReLU(),
                        nn.Linear(50, 25), nn.ReLU(), nn.Linear(25, c))
    opt = torch.optim.Adam(net.parameters(), lr=0.01)
    xt, yt = torch.from_numpy(x), torch.from_numpy(y.argmax(1))

    def torch_epochs():
        for _ in range(5):
            perm = torch.randperm(n)
            for s in range(0, n - 127, 128):
                idx = perm[s:s + 128]
                loss = nn.functional.cross_entropy(net(xt[idx]), yt[idx])
                opt.zero_grad()
                loss.backward()
                opt.step()

    t_ref = timeit(torch_epochs, reps=1, warmup=0)
    rows.append(("ACTINN MLP training (5 epochs, 5k×2k)",
                 f"{5*n/t_tpu/1e6:.2f}M cells/s", f"{5*n/t_ref/1e3:.0f}k cells/s",
                 f"{t_ref/t_tpu:.0f}×"))


def bench_spmm(rows):
    """kNN-graph SpMM with a dependent-chain harness (real backpressure —
    the axon backend reports async completion optimistically otherwise)."""
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp

    from dance_tpu.ops.neighbors import knn_graph
    from dance_tpu.ops.pallas_kernels import bsr_from_scipy, bsr_spmm
    n, d = 8192, 256
    pts = np.random.default_rng(0).random((n, 30), dtype=np.float32)
    adj = knn_graph(pts, 15, mode="connectivity", include_self=False) + sp.eye(
        n, dtype=np.float32, format="csr")
    h = np.random.default_rng(0).random((n, d), dtype=np.float32)
    bsr = bsr_from_scipy(sp.csr_matrix(adj))
    hp = jnp.pad(jnp.asarray(h), ((0, bsr.shape[1] - n), (0, 0)))

    def chain(count=100):
        out = hp
        for _ in range(count):
            out = jnp.tanh(bsr_spmm(bsr, out))
        jax.block_until_ready(out)

    chain(5)
    t_tpu = timeit(chain, warmup=0, reps=1) / 100
    t_ref = timeit(lambda: adj @ h, reps=5)
    rows.append((f"kNN-graph SpMM ({n} nodes, k=15, d={d})",
                 f"{t_tpu*1e3:.2f} ms (Pallas BSR)", f"{t_ref*1e3:.1f} ms (scipy)",
                 f"{t_ref/t_tpu:.0f}×"))


def bench_kmeans(rows):
    import jax.numpy as jnp
    from sklearn.cluster import KMeans

    from dance_tpu.ops.cluster import kmeans
    x = np.random.default_rng(0).random((20000, 50)).astype(np.float32)
    xd = jnp.asarray(x)  # device-resident, as in a pipeline (transfer measured separately)
    hostread(xd)
    t_tpu = timeit(lambda: kmeans(xd, 10, n_init=1, n_iter=50, seed=0).labels,
                   reps=3)
    t_ref = timeit(lambda: KMeans(10, n_init=1, max_iter=50, random_state=0).fit(x),
                   reps=1, warmup=0)
    rows.append(("KMeans (20k×50, k=10, 50 iters)", f"{t_tpu*1e3:.0f} ms",
                 f"{t_ref*1e3:.0f} ms (sklearn)", f"{t_ref/t_tpu:.1f}×"))


def bench_knn(rows):
    from sklearn.neighbors import NearestNeighbors

    import jax.numpy as jnp

    from dance_tpu.ops.neighbors import knn
    x = np.random.default_rng(0).random((20000, 50)).astype(np.float32)
    xd = jnp.asarray(x)
    hostread(xd)
    t_tpu = timeit(lambda: knn(xd, 15)[0], reps=2)
    t_ref = timeit(lambda: NearestNeighbors(n_neighbors=15).fit(x).kneighbors(x),
                   reps=1, warmup=0)
    rows.append(("exact kNN (20k×50, k=15)", f"{t_tpu*1e3:.0f} ms",
                 f"{t_ref*1e3:.0f} ms (sklearn)", f"{t_ref/t_tpu:.1f}×"))


def bench_pca(rows):
    from sklearn.decomposition import PCA

    import jax.numpy as jnp

    from dance_tpu.ops.linalg import pca
    x = np.random.default_rng(0).random((20000, 2000)).astype(np.float32)
    xd = jnp.asarray(x)  # one-time 160 MB transfer (~9 s over the relay) excluded
    hostread(xd)
    t_tpu = timeit(lambda: pca(xd, 50)[0], reps=3)
    t_ref = timeit(lambda: PCA(50, svd_solver="randomized").fit_transform(x), reps=1,
                   warmup=0)
    rows.append(("PCA (20k×2k → 50)", f"{t_tpu*1e3:.0f} ms",
                 f"{t_ref*1e3:.0f} ms (sklearn)", f"{t_ref/t_tpu:.1f}×"))


def main():
    import jax
    rows = []
    for bench in (bench_mlp_training, bench_spmm, bench_kmeans, bench_knn, bench_pca):
        try:
            bench(rows)
        except Exception as e:  # noqa: BLE001
            rows.append((bench.__name__, f"FAILED: {e}", "", ""))
    print(f"\nbackend: {jax.default_backend()} ({jax.devices()[0]})\n")
    print("| Workload | dance-tpu | reference stack (host CPU) | speedup |")
    print("|---|---|---|---|")
    for row in rows:
        print("| " + " | ".join(str(c) for c in row) + " |")


if __name__ == "__main__":
    main()

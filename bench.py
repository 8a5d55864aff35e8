"""Benchmark: scDeepSort GNN training step (Pallas BSR fast path) on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: the flagship graph model — scDeepSort's AdaptiveSAGE message
passing (2 layers + head) trained full-graph on a 12k-cell x 2k-gene
bipartite expression graph (~1.2M directed edges + self-loops, 256-d
features), the regime the reference runs through DGL's C++ SpMM
(scdeepsort.py:183). Ours runs through the AdaptiveBSR decomposition: one
Pallas block-sparse SpMM per layer (ops/sparse.AdaptiveBSR).

Measurement: steady-state step rate via a host-synced epoch delta —
time(N+M steps) - time(N steps), each timing ended by an actual device→host
parameter read (``block_until_ready`` can return optimistically on the axon
relay; a transfer cannot). The one-time compile and graph upload cancel.

Baseline (``vs_baseline``): the reference's technology stack measured
like-for-like on this host — a torch-CPU implementation of the same
AdaptiveSAGE step (scatter-mean message passing, same graph/shapes/loss,
fwd+bwd+Adam). DGL itself is not installable here; torch scatter ops are the
faithful stand-in for its CPU path (the reference's own CI runs CPU tests).
This is an honest single-chip vs single-host-CPU comparison, not a claim
about V100s; BENCH_NOTES.md carries the full context.

``vs_baseline`` stability: the host lane runs on this VM's ONE contended CPU
core and its rate varied 3x across rounds (163 cells/s in BENCH_r02, 506 in
BENCH_r03) at near-identical TPU rates. To keep the ratio comparable across
rounds it is computed against max(live host rate, PINNED_HOST_CELLS_PER_SEC)
— the fastest host rate ever measured on this machine, i.e. the denominator
most favorable to the baseline. Both rates are emitted alongside.
"""

import json
import time

import numpy as np

# Fastest torch-CPU lane rate observed on this machine (BENCH_r03, round 3);
# see module docstring. Update only upward (a faster host run).
PINNED_HOST_CELLS_PER_SEC = 506.0


def build_graph(n_cells=12000, n_genes=2000, dim=256, density=0.025, seed=0):
    import scipy.sparse as sp

    from dance_tpu.graph import Graph

    rng = np.random.default_rng(seed)
    expr = sp.random(n_cells, n_genes, density=density, random_state=seed,
                     dtype=np.float32, format="csr")
    g = Graph.from_cell_feature_matrix(
        expr, rng.random((n_cells, dim), dtype=np.float32),
        rng.random((n_genes, dim), dtype=np.float32))
    labels = rng.integers(0, 8, n_cells)
    return g, labels


def bench_tpu(g, labels, n_cells):
    import jax

    from dance_tpu.modules.single_modality.cell_type_annotation import ScDeepSort

    model = ScDeepSort(dim_in=256, dim_hid=256, num_layers=2, seed=0)

    def timed_fit(epochs):
        t0 = time.perf_counter()
        model.fit(g, labels, epochs=epochs, val_ratio=0.0, use_bsr=True)
        # real synchronization: pull a trained weight scalar to the host
        float(jax.numpy.asarray(
            jax.tree_util.tree_leaves(model.params)[0]).sum())
        return time.perf_counter() - t0

    timed_fit(1)  # compile + upload
    # The relay shows multi-second load spikes between identical runs
    # (BENCH_NOTES.md); min-over-reps is robust to additive noise while the
    # epoch delta still cancels upload/compile costs.
    base, extra = 20, 300
    smalls, bigs = [], []
    for _ in range(4):
        smalls.append(timed_fit(base))
        bigs.append(timed_fit(base + extra))
    per_step = (min(bigs) - min(smalls)) / extra
    if per_step <= 0:  # spike landed on a small run; fall back to big-run rate
        per_step = min(bigs) / (base + extra)
    return n_cells / per_step, per_step


def bench_torch_cpu(g, labels, n_cells, dim=256, hid=256, n_steps=3):
    """Reference-stack equivalent: torch-CPU AdaptiveSAGE step (scatter-mean)."""
    import torch

    adj = g.adj.tocoo()
    src = torch.from_numpy(adj.col.astype(np.int64))
    dst = torch.from_numpy(adj.row.astype(np.int64))
    w = torch.from_numpy(adj.data.astype(np.float32))
    gene_id = np.asarray(g.ndata["cell_id"])
    n_genes = int(g.info["num_genes"])
    # per-edge alpha index (reference models/nn/gnn.py:62-83)
    src_id, dst_id = gene_id[adj.col], gene_id[adj.row]
    idx = np.full(len(src_id), n_genes + 1, dtype=np.int64)
    idx = np.where((src_id >= 0) & (dst_id < 0), src_id, idx)
    idx = np.where((dst_id >= 0) & (src_id < 0), dst_id, idx)
    idx = np.where((dst_id >= 0) & (src_id >= 0), n_genes, idx)
    idx = torch.from_numpy(idx)
    deg = torch.from_numpy(
        np.maximum(np.diff(g.adj.indptr), 1).astype(np.float32))[:, None]
    feats = torch.from_numpy(np.asarray(g.ndata["features"], np.float32))
    n = feats.shape[0]
    y = torch.from_numpy(
        np.concatenate([-np.ones(n_genes, np.int64), labels.astype(np.int64)]))
    mask = y >= 0

    alpha = torch.nn.Parameter(torch.ones(n_genes + 2))
    lin1 = torch.nn.Linear(dim, hid)
    lin2 = torch.nn.Linear(hid, hid)
    head = torch.nn.Linear(hid, 8)
    norm1, norm2 = torch.nn.LayerNorm(hid), torch.nn.LayerNorm(hid)
    params = ([alpha] + list(lin1.parameters()) + list(lin2.parameters())
              + list(head.parameters()) + list(norm1.parameters())
              + list(norm2.parameters()))
    opt = torch.optim.Adam(params, lr=1e-3)

    def layer(h, lin, norm):
        msgs = h[src] * (alpha[idx] * w)[:, None]
        agg = torch.zeros(n, h.shape[1]).index_add_(0, dst, msgs) / deg
        return norm(torch.relu(lin(agg)))

    def step():
        opt.zero_grad()
        h = layer(feats, lin1, norm1)
        h = layer(h, lin2, norm2)
        logits = head(h)
        loss = torch.nn.functional.cross_entropy(logits[mask], y[mask])
        loss.backward()
        opt.step()

    step()  # warm caches
    t0 = time.perf_counter()
    for _ in range(n_steps):
        step()
    per_step = (time.perf_counter() - t0) / n_steps
    return n_cells / per_step, per_step


def main():
    n_cells = 12000
    g, labels = build_graph(n_cells=n_cells)
    tpu_rate, tpu_step = bench_tpu(g, labels, n_cells)
    cpu_rate, cpu_step = bench_torch_cpu(g, labels, n_cells)
    baseline_rate = max(cpu_rate, PINNED_HOST_CELLS_PER_SEC)
    print(json.dumps({
        "metric": "scdeepsort_bsr_train_cells_per_sec",
        "value": round(tpu_rate, 1),
        "unit": "cells/sec",
        "vs_baseline": round(tpu_rate / baseline_rate, 2),
        "host_live_cells_per_sec": round(cpu_rate, 1),
        "host_pinned_cells_per_sec": PINNED_HOST_CELLS_PER_SEC,
    }))


if __name__ == "__main__":
    main()

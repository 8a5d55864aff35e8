"""Benchmark: ACTINN training throughput on TPU vs the reference anchor.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: ACTINN (MLP 100-50-25) training on 5,000 cells × 2,000 genes
synthetic expression, batch 128, 50 epochs — the reference ACTINN's default
training budget (actinn.py fit defaults). Throughput is cells/sec of training
(post-compile) including the full fit() path.

Baseline: the reference's stored CTA trial telemetry (~38-48 s per 50-epoch
trial on ~2k-cell datasets on V100, dance/pipeline.py:861-867 +
BASELINE.md) implies ≈3,300 train-cells/sec for the torch ACTINN loop.
``vs_baseline`` is measured-throughput / 3300.
"""

import json
import time

import numpy as np


def main():
    import jax

    from dance_tpu.modules.single_modality.cell_type_annotation import ACTINN

    n_cells, n_genes, n_types = 5000, 2000, 8
    rng = np.random.default_rng(0)
    x = rng.random((n_cells, n_genes), dtype=np.float32)
    y = np.eye(n_types, dtype=np.float32)[rng.integers(0, n_types, n_cells)]

    model = ACTINN(hidden_dims=(100, 50, 25), lambd=0.01, random_seed=0)
    # warmup: compile the jitted epoch
    model.fit(x, y, num_epochs=1, batch_size=128, seed=0)

    epochs = 50  # reference ACTINN default budget
    t0 = time.perf_counter()
    model.fit(x, y, num_epochs=epochs, batch_size=128, seed=0)
    jax.block_until_ready(model.params)
    elapsed = time.perf_counter() - t0

    cells_per_sec = n_cells * epochs / elapsed
    baseline = 3300.0  # reference V100 torch ACTINN estimate (see module docstring)
    print(json.dumps({
        "metric": "actinn_train_cells_per_sec",
        "value": round(cells_per_sec, 1),
        "unit": "cells/sec",
        "vs_baseline": round(cells_per_sec / baseline, 2),
    }))


if __name__ == "__main__":
    main()

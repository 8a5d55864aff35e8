"""Similarity-matrix heatmap (parity: examples/atlas/sc_similarity_examples/
visualization/visualize_sim.py — renders the per-metric dataset-to-dataset
similarity tables as annotated heatmaps for the atlas platform docs)."""

import argparse
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 4)[0])
import numpy as np
import pandas as pd

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--sim_csv", default=None,
                   help="similarity table CSV (rows/cols = datasets); "
                        "omitted -> synthetic demo matrix")
    p.add_argument("--out", default="results/similarity/sim_heatmap.png")
    args = p.parse_args()

    if args.sim_csv:
        tbl = pd.read_csv(args.sim_csv, index_col=0)
    else:
        rng = np.random.default_rng(0)
        names = [f"ds{i}" for i in range(6)]
        m = rng.random((6, 6))
        m = (m + m.T) / 2
        np.fill_diagonal(m, 1.0)
        tbl = pd.DataFrame(m, index=names, columns=names)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(1 + 0.6 * len(tbl.columns),
                                    1 + 0.6 * len(tbl)))
    im = ax.imshow(tbl.values, cmap="viridis", vmin=0, vmax=1)
    ax.set_xticks(range(len(tbl.columns)), tbl.columns, rotation=45,
                  ha="right")
    ax.set_yticks(range(len(tbl)), tbl.index)
    for i in range(len(tbl)):
        for j in range(len(tbl.columns)):
            ax.text(j, i, f"{tbl.values[i, j]:.2f}", ha="center", va="center",
                    color="w", fontsize=8)
    fig.colorbar(im, ax=ax, shrink=0.8)
    ax.set_title("Dataset similarity")
    fig.tight_layout()
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out} ({len(tbl)}x{len(tbl.columns)})")

"""Optimal weights for combining similarity metrics (parity:
examples/atlas/sc_similarity_examples/similarity/optimize_similarity_weights.py).

For each feature-based similarity metric, grid-search the weight ``w`` in
``w * feature_sim + (1 - w) * metadata_sim`` that minimizes the total rank of
the recommendation: for every query dataset, the atlas dataset with the
highest combined similarity is selected, and the rank of that dataset's
stored best-method accuracy among all atlas candidates is accumulated
(lower = the recommendation points at genuinely better-transferring configs).

Inputs are the per-tissue similarity tables written by ``main.py`` plus an
accuracy table (atlas dataset -> achieved accuracy when its best config is
applied to the query). Without staged tables it runs on a synthetic demo.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 4)[0])
import numpy as np
import pandas as pd

FEATURES = ["wasserstein", "hausdorff", "chamfer", "energy", "sinkhorn2",
            "bures", "spectral", "mmd", "cosine", "pearson"]


def demo_tables(n_query=4, n_atlas=6, seed=0):
    """Synthetic similarity + accuracy tables with a planted signal: the
    'wasserstein' column correlates with transfer accuracy."""
    rng = np.random.default_rng(seed)
    sims, accs = {}, {}
    for q in range(n_query):
        true_quality = rng.random(n_atlas)
        tbl = pd.DataFrame(index=[f"atlas{i}" for i in range(n_atlas)])
        for feat in FEATURES:
            noise = 0.15 if feat == "wasserstein" else 1.0
            tbl[feat] = true_quality + rng.normal(0, noise, n_atlas)
        tbl["metadata_sim"] = true_quality + rng.normal(0, 0.5, n_atlas)
        sims[f"query{q}"] = tbl
        accs[f"query{q}"] = pd.Series(0.5 + 0.4 * true_quality,
                                      index=tbl.index)
    return sims, accs


def total_rank(sims, accs, feature, w):
    total = 0
    for q, tbl in sims.items():
        combined = w * _z(tbl[feature]) + (1 - w) * _z(tbl["metadata_sim"])
        choice = combined.idxmax()
        acc = accs[q]
        total += int((acc > acc[choice]).sum()) + 1
    return total


def _z(col):
    col = col.astype(float)
    std = col.std()
    return (col - col.mean()) / (std if std > 0 else 1.0)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--sim_dir", default=None,
                   help="directory of per-query similarity CSVs "
                        "(rows=atlas datasets, cols=metrics); "
                        "omitted -> synthetic demo")
    p.add_argument("--acc_csv", default=None,
                   help="accuracy table CSV (rows=atlas datasets, "
                        "cols=query datasets)")
    p.add_argument("--weights", type=int, default=21,
                   help="grid resolution for w in [0, 1]")
    p.add_argument("--out", default="results/similarity/optimal_weights.csv")
    args = p.parse_args()

    if args.sim_dir:
        sims = {os.path.splitext(f)[0]: pd.read_csv(
                    os.path.join(args.sim_dir, f), index_col=0)
                for f in sorted(os.listdir(args.sim_dir))
                if f.endswith(".csv")}
        acc_tbl = pd.read_csv(args.acc_csv, index_col=0)
        accs = {q: acc_tbl[q] for q in sims}
    else:
        print("No staged tables; running the synthetic demo")
        sims, accs = demo_tables()

    feats = [f for f in FEATURES if all(f in t.columns for t in sims.values())]
    rows = []
    for feat in feats:
        for w in np.linspace(0, 1, args.weights):
            rows.append({"feature": feat, "w": round(float(w), 3),
                         "total_rank": total_rank(sims, accs, feat, w)})
    res = pd.DataFrame(rows).sort_values("total_rank")
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    res.to_csv(args.out, index=False)
    best = res.iloc[0]
    print(res.head(8).to_string(index=False))
    print(f"Best: feature={best['feature']} w={best['w']} "
          f"total_rank={int(best['total_rank'])} -> {args.out}")

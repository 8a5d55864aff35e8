"""Pattern mining over sweep results (parity: examples/result_analysis/
get_important_pattern.py).

Finds preprocessing-step patterns (single steps and pairs) whose trials score
significantly above the rest, via rank-sum testing over sweep summary CSVs.
"""

import argparse
import itertools

import numpy as np
import pandas as pd
from scipy.stats import mannwhitneyu


def get_important_pattern(df: pd.DataFrame, metric: str = "test_acc",
                          alpha: float = 0.05, max_order: int = 2):
    """Return [(pattern, mean_score, p_value)] sorted by mean score."""
    pipe_cols = [c for c in df.columns if c.startswith("pipeline.")]
    results = []
    for order in range(1, max_order + 1):
        for cols in itertools.combinations(pipe_cols, order):
            groups = df.groupby(list(cols))[metric]
            for pattern, scores in groups:
                rest = df[~df.index.isin(scores.index)][metric]
                if len(scores) < 2 or len(rest) < 2:
                    continue
                stat, p = mannwhitneyu(scores, rest, alternative="greater")
                if p < alpha:
                    key = pattern if isinstance(pattern, tuple) else (pattern,)
                    results.append((dict(zip(cols, key)), float(scores.mean()),
                                    float(p)))
    return sorted(results, key=lambda r: -r[1])


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("results_csv", nargs="?", default=None,
                   help="sweep summary CSV; omitted -> synthetic demo table")
    p.add_argument("--metric", default="test_acc")
    p.add_argument("--alpha", type=float, default=0.05)
    args = p.parse_args()
    if args.results_csv is None:
        rng = np.random.default_rng(0)
        steps = rng.choice(["Log1P", "NormalizeTotal", "ScTransform"], 60)
        df = pd.DataFrame({
            "pipeline.0.normalize": steps,
            "pipeline.1.feature": rng.choice(["CellPCA", "CellSVD"], 60),
            "test_acc": rng.normal(0.7, 0.05, 60) + 0.15 * (steps == "ScTransform"),
        })
        print("(no CSV given; mining a synthetic demo table)")
    else:
        df = pd.read_csv(args.results_csv)
    for pattern, mean, pval in get_important_pattern(df, args.metric, args.alpha):
        print(f"{mean:.4f}  p={pval:.3g}  {pattern}")

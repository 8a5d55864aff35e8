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



def get_frequent_itemsets(df: pd.DataFrame, metric: str = "test_acc",
                          ascending: bool = False, threshold_per: float = 0.1,
                          min_support: float = 0.5, max_order: int = 2):
    """Frequent step patterns among the top trials (parity:
    get_important_pattern.py:117 — apriori over top-quantile configurations;
    first-party implementation, no mlxtend)."""
    pipe_cols = [c for c in df.columns if c.startswith("pipeline.")]
    top_n = max(int(len(df) * threshold_per), 1)
    top = df.sort_values(metric, ascending=ascending).head(top_n)
    out, seen = [], set()
    for order in range(1, max_order + 1):
        for cols in itertools.combinations(pipe_cols, order):
            counts = top.groupby(list(cols)).size()
            for pattern, cnt in counts.items():
                support = cnt / len(top)
                if support >= min_support:
                    key = pattern if isinstance(pattern, tuple) else (pattern,)
                    item = tuple(zip(cols, key))
                    if item not in seen:
                        seen.add(item)
                        out.append({"pattern": dict(item), "support": float(support)})
    return sorted(out, key=lambda r: -r["support"])


def get_com_all(df: pd.DataFrame, metric: str = "test_acc", ascending: bool = False,
                alpha: float = 0.05, vis: bool = False):
    """Patterns whose trials rank significantly above the rest (parity:
    get_important_pattern.py:203)."""
    greater = not ascending
    res = get_important_pattern(df, metric=metric, alpha=alpha, max_order=2) \
        if greater else _get_important_pattern_min(df, metric, alpha)
    if vis:
        for pattern, mean, p in res:
            print(f"{mean:.4f}  p={p:.3g}  {pattern}")
    return [tuple(sorted(r[0].items())) for r in res]


def _get_important_pattern_min(df, metric, alpha):
    d2 = df.copy()
    d2["_neg"] = -d2[metric]
    return [(p, -m, v) for p, m, v in get_important_pattern(d2, "_neg", alpha)]


def get_forest_model_pattern(df: pd.DataFrame, metric: str = "test_acc"):
    """Random-forest feature importance over one-hot pipeline steps (parity:
    get_important_pattern.py:227; the reference validates with SHAP +
    point-biserial — here importances are validated with point-biserial
    correlation directly, shap being unavailable offline)."""
    from scipy.stats import pointbiserialr
    from sklearn.ensemble import RandomForestRegressor
    pipe_cols = [c for c in df.columns if c.startswith("pipeline.")]
    X = pd.get_dummies(df[pipe_cols].astype(str))
    y = df[metric].to_numpy()
    if X.shape[1] == 0 or len(df) < 5:
        return {}
    rf = RandomForestRegressor(n_estimators=200, random_state=0).fit(X, y)
    out = {}
    for name, imp in zip(X.columns, rf.feature_importances_):
        if imp <= 0:
            continue
        r, p = pointbiserialr(X[name].to_numpy().astype(float), y)
        out[name] = {"importance": float(imp), "pointbiserial_r": float(r),
                     "p_value": float(p)}
    return dict(sorted(out.items(), key=lambda kv: -kv[1]["importance"]))


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

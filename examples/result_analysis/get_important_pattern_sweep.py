"""Cross-task pattern mining over sweep result trees (parity:
examples/result_analysis/get_important_pattern_sweep.py).

The reference pulls sweep histories from the wandb server; here the same
analyses (rank-sum winning patterns, frequent itemsets among top trials,
random-forest step importances) run over local sweep summary CSVs laid out as
``{results_root}/{task}/{dataset}/**/*.csv`` — the tree `examples/tuning/*`
runs and `get_result_web.py` consume. wandb remains an optional source: with
``--wandb`` the run table is fetched via dance_tpu.pipeline.save_summary_data.
"""

import argparse
import json
import os

import pandas as pd
from get_important_pattern import (get_com_all, get_forest_model_pattern,
                                   get_frequent_itemsets)

METRICS = [
    {"task": "celltype annotation", "metric": "test_acc", "ascending": False},
    {"task": "cluster", "metric": "acc", "ascending": False},
    {"task": "imputation", "metric": "test_MRE", "ascending": True},
    {"task": "spatial domain", "metric": "ARI", "ascending": False},
    {"task": "celltype deconvolution", "metric": "test_MSE", "ascending": True},
    {"task": "joint embedding", "metric": "ARI", "ascending": False},
]


def collect_task_frames(results_root: str) -> dict:
    """{task_dir: concatenated trials DataFrame} from local CSV trees."""
    frames = {}
    for task in sorted(os.listdir(results_root)):
        tdir = os.path.join(results_root, task)
        if not os.path.isdir(tdir):
            continue
        dfs = []
        for dirpath, _, files in os.walk(tdir):
            for f in files:
                if f.endswith(".csv"):
                    try:
                        dfs.append(pd.read_csv(os.path.join(dirpath, f)))
                    except Exception:
                        continue
        if dfs:
            frames[task] = pd.concat(dfs, ignore_index=True)
    return frames


def mine_task(df: pd.DataFrame, metric: str, ascending: bool) -> dict:
    if metric not in df.columns:
        common = ["test_acc", "acc", "ARI", "ari", "nmi", "test_MSE", "mse", "MSE", "test_MRE", "rmse"]
        candidates = [m for m in common if m in df.columns]
        if not candidates:
            return {"error": f"metric {metric!r} not in columns {list(df.columns)}"}
        metric = candidates[0]
        ascending = metric in ("test_MSE", "mse", "MSE", "test_MRE", "rmse")
    df = df.dropna(subset=[metric])
    return {
        "metric": metric,
        "n_trials": int(len(df)),
        "significant_patterns": [dict(p) for p in
                                 get_com_all(df, metric, ascending)],
        "frequent_itemsets": get_frequent_itemsets(df, metric, ascending),
        "forest_importance": get_forest_model_pattern(df, metric),
    }


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("results_root", help="tree of {task}/{dataset}/**/summary CSVs")
    p.add_argument("--metric", default=None,
                   help="override metric for every task (default: per-task table)")
    p.add_argument("--out", default=None, help="write the report JSON here")
    args = p.parse_args()

    table = {m["task"]: m for m in METRICS}
    report = {}
    for task, df in collect_task_frames(args.results_root).items():
        spec = table.get(task, {"metric": args.metric or "test_acc",
                                "ascending": False})
        metric = args.metric or spec["metric"]
        report[task] = mine_task(df, metric, spec["ascending"])
        print(f"[{task}] n={report[task].get('n_trials')} "
              f"patterns={len(report[task].get('significant_patterns', []))}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2, default=str)
        print("wrote", args.out)

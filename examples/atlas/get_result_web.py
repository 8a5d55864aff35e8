"""Sweep-result aggregation for the atlas web platform (parity:
examples/atlas/get_result_web.py:20-92).

Walks stored result CSVs under a sweep-results tree, recovers each method's
best accuracy per dataset, and assembles per-tissue ``{tissue}_ans.csv``
answer tables consumed by the recommendation backend.
"""

import argparse
import os

import pandas as pd


def check_identical_strings(strings):
    if not strings:
        raise ValueError("empty string list")
    if any(s != strings[0] for s in strings):
        raise ValueError(f"strings differ: {strings}")
    return strings[0]


def collect_best_results(results_root: str, metric: str = "test_acc") -> pd.DataFrame:
    """Walk {results_root}/{method}/{dataset}/results/**/*.csv, pick best rows."""
    rows = []
    for method in sorted(os.listdir(results_root)):
        mdir = os.path.join(results_root, method)
        if not os.path.isdir(mdir):
            continue
        for dataset in sorted(os.listdir(mdir)):
            ddir = os.path.join(mdir, dataset)
            if not os.path.isdir(ddir):
                continue
            best, best_row = -float("inf"), None
            for dirpath, _, files in os.walk(ddir):
                for f in files:
                    if not f.endswith(".csv"):
                        continue
                    try:
                        df = pd.read_csv(os.path.join(dirpath, f))
                    except Exception:
                        continue
                    if metric not in df.columns or df.empty:
                        continue
                    i = df[metric].idxmax()
                    if df.loc[i, metric] > best:
                        best = df.loc[i, metric]
                        best_row = df.loc[i].to_dict()
            if best_row is not None:
                rows.append({"method": method, "dataset": dataset, metric: best,
                             **{k: v for k, v in best_row.items()
                                if k.startswith("pipeline.")}})
    return pd.DataFrame(rows)


def write_ans_table(results_root: str, tissue: str, out_dir: str = ".",
                    metric: str = "test_acc") -> str:
    df = collect_best_results(results_root, metric)
    path = os.path.join(out_dir, f"{tissue}_ans.csv")
    df.to_csv(path, index=False)
    return path


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--results_root", required=True)
    p.add_argument("--tissue", default="heart")
    p.add_argument("--out_dir", default=".")
    p.add_argument("--metric", default="test_acc")
    args = p.parse_args()
    print(write_ans_table(args.results_root, args.tissue, args.out_dir, args.metric))

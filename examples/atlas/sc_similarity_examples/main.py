"""Pairwise dataset-similarity example (parity: examples/atlas/
sc_similarity_examples — computes the AnnDataSimilarity metric panel across a
directory of h5ad atlas datasets and writes the per-metric similarity tables
the recommendation backend consumes)."""

import argparse
import itertools
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 4)[0])
import numpy as np
import pandas as pd

from dance_tpu.atlas import AnnDataSimilarity
from dance_tpu.data import AnnData, read_h5ad, write_h5ad


def stage_demo(root: str, n_ds: int = 3, seed: int = 0):
    rng = np.random.default_rng(seed)
    base = rng.gamma(2, 1, 60)
    os.makedirs(root, exist_ok=True)
    for i in range(n_ds):
        scale = 1.0 + 2.0 * i  # progressively shifted expression
        x = rng.poisson(base * scale, (80, 60)).astype(np.float32)
        write_h5ad(AnnData(X=x), os.path.join(root, f"ds{i}.h5ad"))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", default=None,
                   help="directory of .h5ad files; omitted -> staged demo data")
    p.add_argument("--out_dir", default="results/similarity")
    p.add_argument("--n_runs", type=int, default=2)
    p.add_argument("--exclude_config", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "configs/exclude_dataset.json"))
    p.add_argument("--sample_size", type=int, default=50)
    args = p.parse_args()

    data_dir = args.data_dir
    if data_dir is None:
        data_dir = "/tmp/atlas_sim_demo"
        stage_demo(data_dir)
        print(f"(no --data_dir; staged demo datasets under {data_dir})")

    exclude = set()
    if args.exclude_config and os.path.isfile(args.exclude_config):
        import json
        with open(args.exclude_config) as f:
            exclude = set(json.load(f).get("exclude", []))
    names = sorted(f for f in os.listdir(data_dir)
                   if f.endswith(".h5ad") and f not in exclude)
    adatas = {n: read_h5ad(os.path.join(data_dir, n)) for n in names}
    tables = {}
    for a, b in itertools.combinations(names, 2):
        sim = AnnDataSimilarity(adatas[a], adatas[b], n_runs=args.n_runs,
                                sample_size=args.sample_size, init_random_state=0)
        for metric, value in sim.compute_similarity().items():
            tables.setdefault(metric, pd.DataFrame(index=names,
                                                   columns=names, dtype=float))
            tables[metric].loc[a, b] = tables[metric].loc[b, a] = value

    os.makedirs(args.out_dir, exist_ok=True)
    for metric, tab in tables.items():
        tab.to_csv(os.path.join(args.out_dir, f"{metric}.csv"))
    print(f"wrote {len(tables)} metric tables to {args.out_dir}")
    print("cosine table:")
    print(tables["cosine"].to_string())

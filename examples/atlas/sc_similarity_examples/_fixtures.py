"""Shared synthetic staging for the atlas similarity workflow examples.

The reference workflow (examples/atlas/sc_similarity_examples/*) operates on
a SIMILARITYDIR tree of per-tissue Excel books + wandb sweeps.  This
environment has neither Excel IO (openpyxl absent) nor wandb/network, so the
repo mirrors the tree as CSV "books" (one directory per book, one CSV per
sheet) and local sweep-result CSVs (the SweepRunner contract used across
examples/tuning).  ``stage_workflow_fixtures`` builds a complete miniature
tree so every workflow script runs end to end offline.

Layout staged under ``root`` (mirroring dance.settings.SIMILARITYDIR):

- ``metadatas/{tissue}_metadata.csv``             per-dataset metadata
- ``sweep_results/{Tissue}_ans.csv``              per-tissue sweep answers
- ``data/Cell Type Annotation Atlas/{tissue}.csv``  conf book (one sheet/tissue)
- ``data/dataset_similarity/{tissue}/{query4}.csv`` raw similarity sheets
  (feature rows x atlas-dataset columns; some entries are complex-number
  strings, as produced by the reference's spectral/bures metrics)
- ``tuning/{method}/{query}/results/atlas/best_test_acc.csv``  local sweep
  caches standing in for the reference's wandb sweeps
"""

import json
import os

import numpy as np
import pandas as pd

TISSUES = ["blood", "heart"]
METHODS = ["cta_actinn", "cta_celltypist", "cta_scdeepsort", "cta_singlecellnet"]
FEATURES = ["wasserstein", "Hausdorff", "chamfer", "energy", "sinkhorn2",
            "bures", "spectral", "mmd", "metadata_sim"]


def _ids(tissue, n, query=False):
    tag = "q" if query else "a"
    return [f"{tissue[:2]}{tag}{i}{'x' * 4}-demo" for i in range(n)]


def stage_workflow_fixtures(root, n_atlas=4, n_query=2, seed=0):
    """Stage the full miniature SIMILARITYDIR tree; returns ``root``."""
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)

    for tissue in TISSUES:
        atlas_ids = _ids(tissue, n_atlas)
        query_ids = _ids(tissue, n_query, query=True)

        # ---- metadata + sweep answers (merge_result_metadata inputs) ----
        md_dir = os.path.join(root, "metadatas")
        os.makedirs(md_dir, exist_ok=True)
        pd.DataFrame({
            "dataset_id": atlas_ids + query_ids,
            "n_cells": rng.integers(500, 5000, n_atlas + n_query),
            "assay": ["10x 3' v3"] * (n_atlas + n_query),
        }).to_csv(os.path.join(md_dir, f"{tissue}_metadata.csv"), index=False)

        sw_dir = os.path.join(root, "sweep_results")
        os.makedirs(sw_dir, exist_ok=True)
        pd.DataFrame({
            # the reference's sweep export suffixes ids with "(...)" notes
            "Dataset_id": [f"{d}(atlas)" for d in atlas_ids] + query_ids,
            **{m: np.round(rng.uniform(0.5, 0.95, n_atlas + n_query), 4)
               for m in METHODS},
        }).to_csv(os.path.join(sw_dir, f"{tissue.capitalize()}_ans.csv"),
                  index=False)

        # ---- conf book: one sheet per tissue ----
        conf_dir = os.path.join(root, "data", "Cell Type Annotation Atlas")
        os.makedirs(conf_dir, exist_ok=True)
        step2 = [
            f"step2:local://tuning/{METHODS[0]}/{d}|step3:none" for d in
            atlas_ids + query_ids
        ]
        conf = pd.DataFrame({
            "dataset_id": atlas_ids + query_ids,
            "queryed": [False] * n_atlas + [True] * n_query,
            **{f"{m}_step2_best_yaml": [
                "- type: normalize\n  target: Log1P\n- type: feature.cell\n"
                "  target: WeightedFeaturePCA"
            ] * (n_atlas + n_query) for m in METHODS},
            **{m: step2 for m in METHODS},
        })
        conf.to_csv(os.path.join(conf_dir, f"{tissue}.csv"), index=False)

        # ---- raw similarity books: sheet per query dataset ----
        raw_dir = os.path.join(root, "data", "dataset_similarity", tissue)
        os.makedirs(raw_dir, exist_ok=True)
        for q in query_ids:
            rows = {}
            for feat in FEATURES:
                vals = rng.uniform(0.1, 0.9, n_atlas)
                if feat in ("spectral", "bures"):  # complex-string entries
                    rows[feat] = [f"({v:.6f}+0j)" for v in vals]
                else:
                    rows[feat] = np.round(vals, 6)
            for m in METHODS:  # per-atlas-dataset accuracy rows
                rows[m] = np.round(rng.uniform(0.4, 0.95, n_atlas), 4)
            df = pd.DataFrame(rows, index=atlas_ids).T
            df.to_csv(os.path.join(raw_dir, f"{q[:4]}.csv"))

        # ---- local sweep caches (wandb stand-in) ----
        for q in query_ids:
            for m in METHODS:
                d = os.path.join(root, "tuning", m, q, "results", "atlas")
                os.makedirs(d, exist_ok=True)
                n_runs = 12
                accs = np.round(rng.uniform(0.4, 0.95, n_runs), 4)
                run_kwargs = [json.dumps([{"dataset": a}]) for a in
                              rng.choice(atlas_ids, n_runs)]
                pd.DataFrame({
                    "run_kwargs": run_kwargs,
                    "test_acc": accs,
                    "pipeline.0.normalize": ["Log1P"] * n_runs,
                }).to_csv(os.path.join(d, "best_test_acc.csv"), index=False)

    return root


def read_book(book_dir):
    """Read a CSV book (directory of sheets) -> {sheet_name: DataFrame}."""
    out = {}
    for f in sorted(os.listdir(book_dir)):
        if f.endswith(".csv"):
            out[f[:-4]] = pd.read_csv(os.path.join(book_dir, f), index_col=0)
    return out


def write_sheet(book_dir, sheet, df, index=True):
    """Write one sheet of a CSV book (mkdir -p semantics)."""
    os.makedirs(book_dir, exist_ok=True)
    df.to_csv(os.path.join(book_dir, f"{sheet}.csv"), index=index)

"""Merge per-tissue dataset metadata with sweep answer tables into the Cell
Type Annotation Atlas book (parity: examples/atlas/sc_similarity_examples/
data_processing/merge_result_metadata.py — the reference appends one Excel
sheet per tissue; here the book is a directory of per-tissue CSVs since
openpyxl is absent in this environment).

Reproduce upstream::

    python data_processing/merge_result_metadata.py  # in sc_similarity_examples

Run here::

    python examples/atlas/sc_similarity_examples/data_processing/merge_result_metadata.py \
        [--sim_root DIR] [--tissues blood heart ...]
"""

import argparse
import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def merge_tissue(sim_root, tissue):
    """metadata ⋈ sweep answers (outer, on dataset_id) for one tissue."""
    metadata_df = pd.read_csv(os.path.join(sim_root, "metadatas",
                                           f"{tissue}_metadata.csv"))
    sweep_result_df = pd.read_csv(os.path.join(
        sim_root, "sweep_results", f"{tissue.capitalize()}_ans.csv"))
    sweep_result_df = sweep_result_df.rename(columns={"Dataset_id": "dataset_id"})
    # the sweep export suffixes ids with "(note)" — strip back to the bare id
    sweep_result_df["dataset_id"] = (
        sweep_result_df["dataset_id"].str.split("(").str[0])
    return metadata_df.merge(sweep_result_df, how="outer", on="dataset_id")


if __name__ == "__main__":
    from _fixtures import TISSUES, stage_workflow_fixtures, write_sheet

    p = argparse.ArgumentParser()
    p.add_argument("--sim_root", default=None,
                   help="SIMILARITYDIR-like tree; omitted -> staged demo")
    p.add_argument("--tissues", nargs="+", default=TISSUES)
    args = p.parse_args()

    sim_root = args.sim_root
    if sim_root is None:
        sim_root = stage_workflow_fixtures("/tmp/atlas_workflow_demo")
        print(f"(no --sim_root; staged demo tree under {sim_root})")

    book = os.path.join(sim_root, "data", "Cell Type Annotation Atlas")
    for tissue in args.tissues:
        result_df = merge_tissue(sim_root, tissue)
        # merge the sweep columns into the conf sheet if one already exists
        sheet_path = os.path.join(book, f"{tissue}.csv")
        if os.path.exists(sheet_path):
            conf = pd.read_csv(sheet_path)
            keep = [c for c in conf.columns
                    if c not in result_df.columns or c == "dataset_id"]
            result_df = conf[keep].merge(result_df, how="outer", on="dataset_id")
        write_sheet(book, tissue, result_df, index=False)
        print(f"{tissue}: wrote {len(result_df)} rows -> {sheet_path}")

"""Per-query-dataset atlas accuracy extraction (parity: examples/atlas/
sc_similarity_examples/similarity/analyze_atlas_accuracy.py — the reference
resolves each (query, method) to a wandb sweep and reads every atlas
dataset's best test_acc out of the sweep's runs; here the sweep cache is the
local SweepRunner CSV tree ``tuning/{method}/{query}/results/atlas/
best_test_acc.csv``, the framework's wandb stand-in).

Run::

    python examples/atlas/sc_similarity_examples/similarity/analyze_atlas_accuracy.py \
        [--sim_root DIR] [--tissue blood] [--methods cta_actinn ...]

Outputs ``data/in_atlas_datas/{tissue}/{methods}_{query}_in_atlas.csv``.
"""

import argparse
import ast
import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dance_tpu import logger  # noqa: E402


def find_unique_matching_row(df, config_col, input_dict_list):
    """The unique row of ``df`` whose ``config_col`` literal equals
    ``input_dict_list`` (raises unless exactly one matches)."""

    def is_match(config_str):
        try:
            return ast.literal_eval(config_str) == input_dict_list
        except (ValueError, SyntaxError):
            return False

    matching_rows = df[df[config_col].apply(is_match)]
    if len(matching_rows) == 1:
        return matching_rows.iloc[0]
    if len(matching_rows) == 0:
        raise ValueError("No matching rows found.")
    raise ValueError(f"Found {len(matching_rows)} matching rows, expected "
                     "exactly one.")


def is_matching_dict(yaml_str, target_dict):
    """Does a tuning-YAML pipeline spec equal a flat run-config dict
    (``pipeline.{i}.{type} -> target``), skipping misc/graph.cell steps and
    SCNFeature targets the way the reference does."""
    import yaml

    yaml_config = yaml.safe_load(yaml_str)
    expected_dict = {}
    for i, item in enumerate(yaml_config):
        if item["type"] in ("misc", "graph.cell") or item["target"] == "SCNFeature":
            continue
        expected_dict[f"pipeline.{i}.{item['type']}"] = item["target"]
    return expected_dict == target_dict


def get_ans(sim_root, query_dataset, method, atlas_datasets):
    """Atlas-dataset accuracies for one (query, method) from the local sweep
    cache; None when the cache row is absent (mirrors the wandb miss path)."""
    result_path = os.path.join(sim_root, "tuning", method, query_dataset,
                               "results", "atlas", "best_test_acc.csv")
    if not os.path.exists(result_path):
        logger.warning("%s not exists", result_path)
        return None
    data = pd.read_csv(result_path)
    ans = pd.DataFrame(index=[method], columns=atlas_datasets, dtype=float)
    for atlas_dataset in atlas_datasets:
        # every local sweep row records its run_kwargs the way the wandb
        # sweep config did: a JSON list of per-run kwargs dicts
        want = [{"dataset": atlas_dataset}]
        try:
            row = find_unique_matching_row(data, "run_kwargs", want)
            ans.loc[method, atlas_dataset] = float(row["test_acc"])
        except ValueError:
            # several runs may share an atlas dataset in the local cache —
            # take the best one (the sweep's purpose)
            mask = data["run_kwargs"].apply(
                lambda s: ast.literal_eval(s) == want
                if isinstance(s, str) and s.startswith("[") else False)
            sub = data[mask]
            if len(sub) == 0:
                logger.warning("no run for %s / %s / %s", query_dataset,
                               method, atlas_dataset)
                continue
            ans.loc[method, atlas_dataset] = float(sub["test_acc"].max())
    return ans


if __name__ == "__main__":
    from _fixtures import METHODS, stage_workflow_fixtures

    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("--methods", default=METHODS, nargs="+")
    parser.add_argument("--tissue", type=str, default="blood")
    parser.add_argument("--sim_root", default=None)
    args = parser.parse_args()

    sim_root = args.sim_root
    if sim_root is None:
        sim_root = stage_workflow_fixtures("/tmp/atlas_workflow_demo")
        print(f"(no --sim_root; staged demo tree under {sim_root})")

    conf_data = pd.read_csv(os.path.join(
        sim_root, "data", "Cell Type Annotation Atlas", f"{args.tissue}.csv"))
    atlas_datasets = list(conf_data[conf_data["queryed"] == False]["dataset_id"])  # noqa: E712
    query_datasets = list(conf_data[conf_data["queryed"] == True]["dataset_id"])  # noqa: E712

    for query_dataset in query_datasets:
        ans = [a for m in args.methods
               if (a := get_ans(sim_root, query_dataset, m, atlas_datasets))
               is not None]
        if not ans:
            continue
        ans = pd.concat(ans)
        print(query_dataset)
        file_path = os.path.join(
            sim_root, "data", "in_atlas_datas", args.tissue,
            f"{args.methods}_{query_dataset}_in_atlas.csv")
        os.makedirs(os.path.dirname(file_path), exist_ok=True)
        ans.to_csv(file_path)
        print(f"  -> {file_path}")

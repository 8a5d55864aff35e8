"""Per-feature atlas-recommendation accuracy tables (parity: examples/atlas/
sc_similarity_examples/visualization/vis_sim_v2_data.py — for every similarity
feature, pick each query's most-similar atlas dataset, look up the accuracy a
method achieves when trained on that pick, and write the per-tissue
``atlas_accs/{tissue}_atlas_acc.csv`` the radar/performance plots consume).

Run::

    python examples/atlas/sc_similarity_examples/visualization/vis_sim_v2_data.py \
        [--sim_root DIR] [--tissues blood heart ...]
"""

import argparse
import os
import sys

import numpy as np
import pandas as pd

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

from similarity.process_tissue_similarity_matrices import convert_to_complex  # noqa: E402

from dance_tpu.utils import set_seed  # noqa: E402

# datasets the reference excludes per tissue (quality flags); kept as the
# user-editable hook it is upstream
exclude_data = {}


def get_atlas_ans(query_dataset, method, feature_name="wasserstein", data=None):
    """(accuracy, picked atlas dataset) for one query/method: the pick is the
    argmax of the ``feature_name`` similarity row."""
    data.loc[feature_name, :] = data.loc[feature_name, :].apply(convert_to_complex)
    weighted_sum = (data.loc[feature_name, :]).astype(float)
    atlas_dataset_res = weighted_sum.idxmax()
    if method in data.index:
        return data.loc[method, atlas_dataset_res], atlas_dataset_res
    return 0, "null"


def get_ans(query_datasets, tissue, exclude_data, sim_root):
    """Load each query's normalized similarity sheet, minus excluded atlas
    datasets."""
    ans = {}
    book = os.path.join(sim_root, "data", "new_sim", tissue)
    for query_dataset in query_datasets:
        data = pd.read_csv(os.path.join(book, f"{query_dataset[:4]}.csv"),
                           index_col=0)
        ans[query_dataset] = data.drop(exclude_data.get(tissue, []), axis=1,
                                       errors="ignore")
    return ans


def get_atlas_acc(ans, methods):
    """Add acc_{method}, sum_acc, and average_acc rows to every sheet."""
    for query_dataset, data in ans.items():
        for method in methods:
            for column in data.columns:
                if pd.isna(data.loc[method, column]):
                    print(f"Warning: {method} has NaN for {query_dataset} in "
                          f"{column}. Setting to 0.")
            data.loc["acc_" + method, :] = data.loc[method, :].fillna(0)
    for query_dataset, data in ans.items():
        if "sum_acc" not in data.index:
            data.loc["sum_acc", :] = 0
        for method in methods:
            data.loc["sum_acc", :] += data.loc["acc_" + method, :].astype(float)
        data.loc["average_acc"] = (data.loc["sum_acc"].astype(float)
                                   / len(methods))
    return ans


def main(argv=None):
    from _fixtures import FEATURES, METHODS, TISSUES, stage_workflow_fixtures

    p = argparse.ArgumentParser()
    p.add_argument("--sim_root", default=None)
    p.add_argument("--tissues", nargs="+", default=TISSUES)
    p.add_argument("--methods", nargs="+", default=METHODS)
    args = p.parse_args(argv)

    sim_root = args.sim_root
    if sim_root is None:
        sim_root = stage_workflow_fixtures("/tmp/atlas_workflow_demo")
        print(f"(no --sim_root; staged demo tree under {sim_root})")
    if not os.path.isdir(os.path.join(sim_root, "data", "new_sim")):
        raise SystemExit("run similarity/process_tissue_similarity_matrices.py "
                         "first (data/new_sim missing)")

    feature_names = [f for f in FEATURES] + ["average_acc"]
    for tissue in args.tissues:
        set_seed(42)
        conf_data = pd.read_csv(os.path.join(
            sim_root, "data", "Cell Type Annotation Atlas", f"{tissue}.csv"))
        query_datasets = [q for q in
                          conf_data[conf_data["queryed"] == True]["dataset_id"]  # noqa: E712
                          if q not in exclude_data.get(tissue, [])]
        ans = get_ans(query_datasets, tissue, exclude_data, sim_root)
        get_atlas_acc(ans, args.methods)
        acc_query = []
        for feature_name in feature_names:
            for query_dataset, data in ans.items():
                current_atlas_dataset = "null"
                for method_key in args.methods:
                    _, current_atlas_dataset = get_atlas_ans(
                        query_dataset, method_key, feature_name=feature_name,
                        data=data)
                acc_query.append({
                    "query_dataset": query_dataset,
                    "current_atlas_dataset": current_atlas_dataset,
                    "average_acc": data.loc["average_acc",
                                            current_atlas_dataset]
                    if current_atlas_dataset != "null" else np.nan,
                    "feature_name": feature_name,
                })
        out = os.path.join(sim_root, "data", "atlas_accs",
                           f"{tissue}_atlas_acc.csv")
        os.makedirs(os.path.dirname(out), exist_ok=True)
        pd.DataFrame(acc_query).set_index(
            ["query_dataset", "current_atlas_dataset"]).to_csv(out)
        print(f"{tissue}: wrote {out}")
    return sim_root


if __name__ == "__main__":
    main()

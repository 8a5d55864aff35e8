"""Combined per-query method comparison, v2 (parity: examples/atlas/
sc_similarity_examples/visualization/visualize_atlas_performance_v2.py — one
figure per query with all methods' run-accuracy boxes side by side, the
atlas-recommended value marked per method, and the per-method percentiles
accumulated into the shared ``data/overall/overall_data.json`` rollup).

Run::

    python examples/atlas/sc_similarity_examples/visualization/visualize_atlas_performance_v2.py \
        [--sim_root DIR] [--tissue blood] [--feature_name wasserstein]
"""

import argparse
import json
import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

from visualization.vis_sim_v2_data import exclude_data, get_ans, get_atlas_ans  # noqa: E402
from visualization.visualize_atlas_performance import get_runs, vis_dict  # noqa: E402

from dance_tpu.utils import set_seed  # noqa: E402


def plot_combined_methods(sim_root, data, query_dataset, methods, tissue,
                          feature_name, save=True, overall_data_tissue=None):
    """All-methods box figure for one query; updates the overall rollup with
    each method's atlas-value percentile."""
    fig, ax = plt.subplots(figsize=(6, 3.5))
    plot_data, target_details, labels = [], [], []
    atlas_for_label = "Unknown Atlas"

    for i, method_key in enumerate(methods):
        target_value, current_atlas = get_atlas_ans(query_dataset, method_key,
                                                    feature_name, data)
        if i == 0 and current_atlas:
            atlas_for_label = current_atlas
        runs = np.asarray(get_runs(sim_root, query_dataset, method_key), float)
        label = vis_dict.get(method_key, method_key)
        tv = float(target_value)
        if len(runs) == 0:
            print(f"No runs data for {query_dataset} with method {method_key}")
            current_pct = 0.0
        else:
            labels.append(label)
            plot_data.append(runs)
            if not np.isnan(tv):
                current_pct = float(np.sum(runs <= tv) / len(runs)) * 100
                target_details.append((len(labels) - 1, tv, current_pct))
            else:
                current_pct = 0.0
        if overall_data_tissue is not None:
            key = f"query_{query_dataset}_atlas_{current_atlas}"
            overall_data_tissue.setdefault(key, {})[label] = current_pct

    if not plot_data:
        ax.text(0.5, 0.5, "No data available for any method", ha="center",
                va="center", transform=ax.transAxes)
    else:
        ax.boxplot(plot_data, widths=0.4, patch_artist=True,
                   boxprops=dict(facecolor="lightseagreen", alpha=0.6))
        ax.set_xticks(range(1, len(labels) + 1))
        ax.set_xticklabels(labels, fontsize=8)
        for pos, tv, pct in target_details:
            ax.hlines(tv, pos + 0.8, pos + 1.2, color="red", linestyle="--",
                      linewidth=2)
            ax.text(pos + 1, tv, f"{tv:.3f}\n({pct:.0f}%)", color="red",
                    ha="center", va="bottom", fontsize=7)
        ax.set_ylabel("accuracy")
    ax.set_title(f"{query_dataset[:12]} ({tissue}, atlas {atlas_for_label[:8]})",
                 fontsize=10)
    fig.tight_layout(rect=[0, 0.05, 1, 0.93])

    result_dir = os.path.join(sim_root, "data", "imgs", "imgs_v2", str(tissue))
    os.makedirs(result_dir, exist_ok=True)
    result_file = os.path.join(result_dir, f"{query_dataset[:8]}.pdf")
    if save:
        fig.savefig(result_file, dpi=300, format="pdf")
        print(f"Saved plot to {result_file}")
    plt.close(fig)
    return result_file


def main(argv=None):
    from _fixtures import METHODS, stage_workflow_fixtures

    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("--tissue", type=str, default="blood")
    parser.add_argument("--feature_name", type=str, default="wasserstein")
    parser.add_argument("--methods", default=METHODS, nargs="+")
    parser.add_argument("--sim_root", default=None)
    args = parser.parse_args(argv)

    sim_root = args.sim_root
    if sim_root is None:
        sim_root = stage_workflow_fixtures("/tmp/atlas_workflow_demo")
        print(f"(no --sim_root; staged demo tree under {sim_root})")
    if not os.path.isdir(os.path.join(sim_root, "data", "new_sim")):
        raise SystemExit("run similarity/process_tissue_similarity_matrices.py "
                         "first (data/new_sim missing)")

    overall_path = os.path.join(sim_root, "data", "overall",
                                "overall_data.json")
    overall_data = {}
    if os.path.exists(overall_path):
        with open(overall_path) as f:
            overall_data = json.load(f)
    overall_data_tissue = overall_data.get(args.tissue, {})

    set_seed(42)
    conf_data = pd.read_csv(os.path.join(
        sim_root, "data", "Cell Type Annotation Atlas", f"{args.tissue}.csv"))
    query_datasets = [q for q in
                      conf_data[conf_data["queryed"] == True]["dataset_id"]  # noqa: E712
                      if q not in exclude_data.get(args.tissue, [])]
    ans = get_ans(query_datasets, args.tissue, exclude_data, sim_root)
    for query_dataset, data in ans.items():
        plot_combined_methods(sim_root, data, query_dataset, args.methods,
                              args.tissue, args.feature_name,
                              overall_data_tissue=overall_data_tissue)

    os.makedirs(os.path.dirname(overall_path), exist_ok=True)
    overall_data[args.tissue] = overall_data_tissue
    with open(overall_path, "w") as f:
        json.dump(overall_data, f, indent=4)
    print(f"wrote {overall_path}")


if __name__ == "__main__":
    main()

"""Atlas-recommendation performance plots (parity: examples/atlas/
sc_similarity_examples/visualization/visualize_atlas_performance.py — for
every query dataset, a box plot per method of the sweep's run accuracies with
the atlas-recommended configuration's accuracy drawn as a line + percentile
annotation; the reference pulls runs from wandb sweeps, here they come from
the local SweepRunner caches under ``tuning/``).

Run::

    python examples/atlas/sc_similarity_examples/visualization/visualize_atlas_performance.py \
        [--sim_root DIR] [--tissue blood] [--feature_name wasserstein]

Outputs ``data/performance/{tissue}_{query}.pdf`` and a summary CSV.
"""

import argparse
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

vis_dict = {
    "cta_actinn": "ACTINN",
    "cta_celltypist": "Celltypist",
    "cta_scdeepsort": "ScDeepsort",
    "cta_singlecellnet": "singleCellNet",
}


def get_accs(sweep_df):
    """All run accuracies in a local sweep cache (wandb get_accs analog)."""
    return [float(a) for a in sweep_df["test_acc"].dropna()]


def get_runs(sim_root, query_dataset, method):
    """Run-accuracy list for one (query, method) from the local cache."""
    path = os.path.join(sim_root, "tuning", method, query_dataset, "results",
                        "atlas", "best_test_acc.csv")
    if not os.path.exists(path):
        return []
    return get_accs(pd.read_csv(path))


def vis(data, target_value, title, ax):
    """Box plot of run accuracies + the atlas value as a line with its
    percentile in the label (the reference's post-violin design)."""
    data_np = np.asarray(data, float)
    ax.boxplot([data_np] if len(data_np) else [[]], widths=0.5,
               patch_artist=True,
               boxprops=dict(facecolor="skyblue", alpha=0.8))
    tv = float(target_value)
    if not np.isnan(tv):
        label = f"Atlas Value: {tv:.4f}"
        if len(data_np):
            pct = (np.sum(data_np <= tv) / len(data_np)) * 100
            label += f"\n({pct:.1f}% percentile)"
        ax.axhline(y=tv, color="red", linestyle="--", linewidth=2, label=label)
        ax.text(1, tv, f"{tv:.4f}", color="red", ha="center", va="bottom",
                size=10)
    ax.set_title(str(title), fontsize=12)
    ax.set_ylabel("test_acc")
    if ax.get_legend_handles_labels()[0]:
        ax.legend(fontsize=8)


def plot_combined_methods(sim_root, ans, query_dataset, methods, tissue,
                          feature_name, out_dir):
    """One figure per query: a box per method, atlas picks marked."""
    fig, axes = plt.subplots(1, len(methods), figsize=(4 * len(methods), 3.5),
                             squeeze=False)
    summary = []
    data = ans[query_dataset]
    for i, method_key in enumerate(methods):
        target_value, atlas_dataset = get_atlas_ans(
            query_dataset, method_key, feature_name=feature_name, data=data)
        runs = get_runs(sim_root, query_dataset, method_key)
        label = vis_dict.get(method_key, method_key)
        if not runs:
            print(f"No runs data for {query_dataset} with method {method_key}")
        vis(runs, float(target_value), f"{label}\n(atlas: {atlas_dataset[:8]})",
            axes[0][i])
        pct = (float(np.mean(np.asarray(runs) <= float(target_value))) * 100
               if runs else np.nan)
        summary.append(dict(query_dataset=query_dataset, method=method_key,
                            atlas_dataset=atlas_dataset,
                            atlas_acc=float(target_value),
                            n_runs=len(runs), percentile=pct))
    fig.suptitle(f"{tissue} / {query_dataset} ({feature_name})", fontsize=13)
    fig.tight_layout()
    out = os.path.join(out_dir, f"{tissue}_{query_dataset[:4]}.pdf")
    fig.savefig(out, dpi=300, format="pdf", bbox_inches="tight")
    plt.close(fig)
    print(f"wrote {out}")
    return summary


def main(argv=None):
    from _fixtures import METHODS, stage_workflow_fixtures

    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("--methods", default=METHODS, nargs="+")
    parser.add_argument("--tissue", type=str, default="blood")
    parser.add_argument("--feature_name", type=str, default="wasserstein")
    parser.add_argument("--sim_root", default=None)
    args = parser.parse_args(argv)

    sim_root = args.sim_root
    if sim_root is None:
        sim_root = stage_workflow_fixtures("/tmp/atlas_workflow_demo")
        print(f"(no --sim_root; staged demo tree under {sim_root})")
    if not os.path.isdir(os.path.join(sim_root, "data", "new_sim")):
        raise SystemExit("run similarity/process_tissue_similarity_matrices.py "
                         "first (data/new_sim missing)")

    conf_data = pd.read_csv(os.path.join(
        sim_root, "data", "Cell Type Annotation Atlas", f"{args.tissue}.csv"))
    query_datasets = [q for q in
                      conf_data[conf_data["queryed"] == True]["dataset_id"]  # noqa: E712
                      if q not in exclude_data.get(args.tissue, [])]
    ans = get_ans(query_datasets, args.tissue, exclude_data, sim_root)

    out_dir = os.path.join(sim_root, "data", "performance")
    os.makedirs(out_dir, exist_ok=True)
    summary = []
    for query_dataset in query_datasets:
        summary += plot_combined_methods(sim_root, ans, query_dataset,
                                         args.methods, args.tissue,
                                         args.feature_name, out_dir)
    out = os.path.join(out_dir, f"{args.tissue}_summary.csv")
    pd.DataFrame(summary).to_csv(out, index=False)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()

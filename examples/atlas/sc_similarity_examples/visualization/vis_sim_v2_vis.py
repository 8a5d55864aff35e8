"""Radar-chart visualization of per-feature similarity profiles (parity:
examples/atlas/sc_similarity_examples/visualization/vis_sim_v2_vis.py — one
polar plot per query dataset, every atlas dataset a polygon over the
similarity features, the recommended dataset highlighted).

Run::

    python examples/atlas/sc_similarity_examples/visualization/vis_sim_v2_vis.py \
        [--sim_root DIR] [--tissues blood heart ...]

Outputs ``data/radar/{tissue}_{query}.png``.
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

from similarity.process_tissue_similarity_matrices import convert_to_complex  # noqa: E402
from visualization.vis_sim_v2_data import exclude_data, get_ans, get_atlas_ans  # noqa: E402

similarity_names = {
    "wasserstein": "Wasserstein similarity",
    "Hausdorff": "Hausdorff similarity",
    "chamfer": "Chamfer similarity",
    "energy": "Energy similarity",
    "sinkhorn2": "Sinkhorn similarity",
    "bures": "Bures similarity",
    "spectral": "Spectral similarity",
    "mmd": "MMD similarity",
}


def plot_pre_normalized_radar(df, highlight_dataset_name, tissue, query_dataset,
                              highlight_color="crimson", other_color="skyblue",
                              other_alpha=0.20, figsize=(10, 8),
                              title="Performance Radar", ylim=(0.0, 1.0),
                              label_distance_factor=1.1):
    """Radar plot: rows = datasets, columns = similarity features (already in
    [0, 1]); the highlighted dataset is the recommendation."""
    if df.empty:
        raise ValueError("Input DataFrame is empty.")
    if highlight_dataset_name not in df.index:
        raise ValueError(f"Dataset '{highlight_dataset_name}' not found.")

    features = [similarity_names.get(f, f) for f in df.columns]
    num_vars = len(features)
    angles = np.linspace(0, 2 * np.pi, num_vars, endpoint=False).tolist()
    angles += angles[:1]

    fig, ax = plt.subplots(figsize=figsize, subplot_kw=dict(polar=True))
    for index, row in df.iterrows():
        is_highlight = index == highlight_dataset_name
        values = row.tolist() + row.tolist()[:1]
        ax.plot(angles, values,
                color=highlight_color if is_highlight else other_color,
                linewidth=1.8 if is_highlight else 0.8,
                alpha=1.0 if is_highlight else other_alpha,
                zorder=4 if is_highlight else 2,
                label=str(index) if is_highlight else None)
        if is_highlight:
            ax.fill(angles, values, color=highlight_color, alpha=0.25)

    ax.set_ylim(*ylim)
    ax.set_xticks(angles[:-1])
    ax.set_xticklabels([])
    for angle, label in zip(angles[:-1], features):
        ax.text(angle, ylim[1] * label_distance_factor, label,
                ha="center", va="center", fontsize=9)
    ax.set_title(f"{title}\n{tissue} / {query_dataset}", fontsize=12)
    ax.legend(loc="lower right", bbox_to_anchor=(1.2, -0.1), fontsize=8)
    return fig


def main(argv=None):
    from _fixtures import METHODS, TISSUES, stage_workflow_fixtures

    p = argparse.ArgumentParser()
    p.add_argument("--sim_root", default=None)
    p.add_argument("--tissues", nargs="+", default=TISSUES)
    p.add_argument("--feature_names", nargs="+",
                   default=list(similarity_names))
    args = p.parse_args(argv)

    sim_root = args.sim_root
    if sim_root is None:
        sim_root = stage_workflow_fixtures("/tmp/atlas_workflow_demo")
        print(f"(no --sim_root; staged demo tree under {sim_root})")
    if not os.path.isdir(os.path.join(sim_root, "data", "new_sim")):
        raise SystemExit("run similarity/process_tissue_similarity_matrices.py "
                         "first (data/new_sim missing)")

    out_dir = os.path.join(sim_root, "data", "radar")
    os.makedirs(out_dir, exist_ok=True)
    for tissue in args.tissues:
        conf_data = pd.read_csv(os.path.join(
            sim_root, "data", "Cell Type Annotation Atlas", f"{tissue}.csv"))
        query_datasets = [q for q in
                          conf_data[conf_data["queryed"] == True]["dataset_id"]  # noqa: E712
                          if q not in exclude_data.get(tissue, [])]
        ans = get_ans(query_datasets, tissue, exclude_data, sim_root)
        for query_dataset, data in ans.items():
            df_sim = (data.loc[args.feature_names, :].T
                      .map(convert_to_complex).astype(float))
            _, pick = get_atlas_ans(query_dataset, METHODS[0],
                                    feature_name=args.feature_names[0],
                                    data=data)
            fig = plot_pre_normalized_radar(df_sim, pick, tissue, query_dataset)
            out = os.path.join(out_dir, f"{tissue}_{query_dataset[:4]}.png")
            fig.savefig(out, dpi=120, bbox_inches="tight")
            plt.close(fig)
            print(f"wrote {out}")


if __name__ == "__main__":
    main()

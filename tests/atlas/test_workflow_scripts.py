"""End-to-end drive of the atlas similarity workflow example chain
(parity surface: examples/atlas/sc_similarity_examples/{data_processing,
similarity,visualization} in the reference)."""

import json
import os
import subprocess
import sys

import pandas as pd
import pytest

ROOT = "/root/repo/examples/atlas/sc_similarity_examples"

CHAIN = [
    ("data_processing/merge_result_metadata.py", []),
    ("similarity/process_tissue_similarity_matrices.py", []),
    ("similarity/analyze_atlas_accuracy.py", ["--tissue", "blood"]),
    ("visualization/vis_sim_v2_data.py", []),
    ("visualization/vis_sim_v2_vis.py", []),
    ("visualization/visualize_atlas_performance.py", ["--tissue", "blood"]),
    ("visualization/visualize_atlas_performance_v2.py", ["--tissue", "heart"]),
]


@pytest.mark.light_test
def test_workflow_chain(tmp_path):
    sim_root = str(tmp_path / "simdir")
    sys.path.insert(0, ROOT)
    try:
        from _fixtures import stage_workflow_fixtures
    finally:
        sys.path.remove(ROOT)
    stage_workflow_fixtures(sim_root)

    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    env["MPLBACKEND"] = "Agg"
    for script, extra in CHAIN:
        out = subprocess.run(
            [sys.executable, os.path.join(ROOT, script),
             "--sim_root", sim_root, *extra],
            capture_output=True, text=True, timeout=600, env=env)
        assert out.returncode == 0, f"{script}: {out.stderr[-2000:]}"

    # every stage left its artifact
    conf = pd.read_csv(os.path.join(
        sim_root, "data", "Cell Type Annotation Atlas", "blood.csv"))
    assert "cta_actinn" in conf.columns and "n_cells" in conf.columns
    combined = pd.read_csv(os.path.join(sim_root, "data", "new_sim",
                                        "combined_output.csv"), index_col=0)
    assert {"file_name", "sheet_name"} <= set(combined.columns)
    in_atlas = os.listdir(os.path.join(sim_root, "data", "in_atlas_datas",
                                       "blood"))
    assert len(in_atlas) == 2  # one per query dataset
    accs = pd.read_csv(os.path.join(sim_root, "data", "atlas_accs",
                                    "blood_atlas_acc.csv"))
    assert {"feature_name", "average_acc"} <= set(accs.columns)
    assert (accs["feature_name"] == "wasserstein").any()
    assert os.path.exists(os.path.join(sim_root, "data", "radar",
                                       "blood_blq0.png"))
    summary = pd.read_csv(os.path.join(sim_root, "data", "performance",
                                       "blood_summary.csv"))
    assert {"atlas_acc", "percentile", "n_runs"} <= set(summary.columns)
    assert (summary["n_runs"] > 0).all()
    with open(os.path.join(sim_root, "data", "overall",
                           "overall_data.json")) as f:
        overall = json.load(f)
    assert overall["heart"], "v2 rollup empty"

"""Benchmark-tier tests re-running the example scripts (parity: tests/test_bench.py).

Two tiers selected by markers:
- ``light_test``: smoke matrix with tiny budgets — every example script runs end
  to end and prints its metric (reference :22-59).
- ``full_test``: full benchmark budgets (reference :61-160).

Both are excluded from the default pytest run (see pyproject.toml); select with
``pytest -m light_test`` / ``pytest -m full_test``.
"""

import os
import runpy
import sys

import pytest

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")

LIGHT_MATRIX = [
    ("single_modality/cell_type_annotation/actinn.py", ["--num_epochs", "2"]),
    ("single_modality/cell_type_annotation/svm.py", []),
    ("single_modality/cell_type_annotation/celltypist.py", []),
    ("single_modality/cell_type_annotation/singlecellnet.py", []),
    ("single_modality/cell_type_annotation/scdeepsort.py", ["--n_epochs", "2"]),
    ("single_modality/cell_type_annotation/scheteronet.py", []),
    ("single_modality/clustering/scdeepcluster.py", ["--epochs", "2"]),
    ("single_modality/clustering/scdcc.py", ["--epochs", "2"]),
    ("single_modality/clustering/graphsc.py", ["--epochs", "2"]),
    ("single_modality/clustering/sctag.py", ["--epochs", "2"]),
    ("single_modality/clustering/scdsc.py", ["--epochs", "2"]),
    ("single_modality/imputation/magic.py", []),
    ("single_modality/imputation/deepimpute.py", []),
    ("single_modality/imputation/graphsci.py", []),
    ("single_modality/imputation/scgnn2.py", []),
    ("multi_modality/predict_modality/babel.py", []),
    ("multi_modality/predict_modality/cmae.py", []),
    ("multi_modality/predict_modality/scmm.py", []),
    ("multi_modality/predict_modality/scmogcn.py", []),
    ("multi_modality/match_modality/cmae.py", []),
    ("multi_modality/match_modality/scmm.py", []),
    ("multi_modality/match_modality/scmogcn.py", []),
    ("multi_modality/joint_embedding/jae.py", []),
    ("multi_modality/joint_embedding/dcca.py", []),
    ("multi_modality/joint_embedding/scmvae.py", []),
    ("multi_modality/joint_embedding/scmogcn.py", []),
    ("multi_modality/joint_embedding/scmogcnv2.py", ["--epochs", "10"]),
    ("spatial/spatial_domain/louvain.py", []),
    ("spatial/spatial_domain/spagcn.py", []),
    ("spatial/spatial_domain/stagate.py", []),
    ("spatial/spatial_domain/stlearn.py", []),
    ("spatial/spatial_domain/EfNST.py", []),
    ("spatial/cell_type_deconvo/card.py", []),
    ("spatial/cell_type_deconvo/spatialdecon.py", []),
    ("spatial/cell_type_deconvo/spotlight.py", []),
    ("spatial/cell_type_deconvo/dstg.py", []),
    ("spatial/cell_type_deconvo/stdgcn.py", []),
]

FULL_MATRIX = [
    ("single_modality/cell_type_annotation/actinn.py", ["--num_epochs", "50"]),
    ("single_modality/cell_type_annotation/svm.py", []),
    ("single_modality/cell_type_annotation/celltypist.py", []),
    ("single_modality/cell_type_annotation/singlecellnet.py", []),
    ("single_modality/cell_type_annotation/scdeepsort.py", ["--n_epochs", "100"]),
    ("single_modality/cell_type_annotation/scheteronet.py", []),
    ("single_modality/clustering/scdeepcluster.py", ["--epochs", "10"]),
    ("single_modality/clustering/scdcc.py", ["--epochs", "10"]),
    ("single_modality/clustering/graphsc.py", ["--epochs", "100"]),
    ("single_modality/clustering/sctag.py", ["--epochs", "100"]),
    ("single_modality/clustering/scdsc.py", ["--epochs", "100"]),
    ("single_modality/imputation/magic.py", []),
    ("single_modality/imputation/deepimpute.py", []),
    ("single_modality/imputation/graphsci.py", []),
    ("single_modality/imputation/scgnn2.py", []),
    ("multi_modality/predict_modality/babel.py", []),
    ("multi_modality/predict_modality/cmae.py", []),
    ("multi_modality/predict_modality/scmm.py", []),
    ("multi_modality/predict_modality/scmogcn.py", []),
    ("multi_modality/match_modality/cmae.py", []),
    ("multi_modality/match_modality/scmm.py", []),
    ("multi_modality/match_modality/scmogcn.py", []),
    ("multi_modality/joint_embedding/jae.py", []),
    ("multi_modality/joint_embedding/dcca.py", []),
    ("multi_modality/joint_embedding/scmvae.py", []),
    ("multi_modality/joint_embedding/scmogcn.py", []),
    ("multi_modality/joint_embedding/scmogcnv2.py", []),
    ("spatial/spatial_domain/louvain.py", []),
    ("spatial/spatial_domain/spagcn.py", []),
    ("spatial/spatial_domain/stagate.py", []),
    ("spatial/spatial_domain/stlearn.py", []),
    ("spatial/spatial_domain/EfNST.py", []),
    ("spatial/cell_type_deconvo/card.py", []),
    ("spatial/cell_type_deconvo/spatialdecon.py", []),
    ("spatial/cell_type_deconvo/spotlight.py", []),
    ("spatial/cell_type_deconvo/dstg.py", []),
    ("spatial/cell_type_deconvo/stdgcn.py", []),
]


def _run(script, extra_args):
    path = os.path.abspath(os.path.join(EXAMPLES, script))
    old_argv = sys.argv
    sys.path.insert(0, os.path.abspath(EXAMPLES))
    try:
        sys.argv = [path] + extra_args
        runpy.run_path(path, run_name="__main__")
    finally:
        sys.argv = old_argv
        sys.path.pop(0)


@pytest.mark.light_test
@pytest.mark.parametrize("script,extra_args", LIGHT_MATRIX,
                         ids=[s for s, _ in LIGHT_MATRIX])
def test_light(script, extra_args):
    _run(script, extra_args)


@pytest.mark.full_test
@pytest.mark.parametrize("script,extra_args", FULL_MATRIX,
                         ids=[s for s, _ in FULL_MATRIX])
def test_full(script, extra_args):
    _run(script, extra_args)

"""Head-to-head metric parity vs the reference implementation.

Runs the reference's torch/sklearn/numpy methods (imported from
/root/reference via benchmarks/refshim.py) and dance_tpu on identical
synthetic data, asserting the metric deltas in benchmarks/parity.py's
tolerances. Excluded from the default tier (each case trains two models);
run with ``./run_tests.sh tests/parity -m ref_parity``.
"""
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", "benchmarks"))

import parity  # noqa: E402

pytestmark = pytest.mark.ref_parity


@pytest.mark.parametrize("name", sorted(parity.CASES))
def test_reference_parity(name):
    record = parity.evaluate(parity.CASES[name]())
    assert record["ok"], (
        f"{name}: ref={record['ref']:.4f} ours={record['ours']:.4f} "
        f"tol={record['tol_repr']}")

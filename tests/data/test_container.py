"""MuData container slicing tests."""

import numpy as np
import pytest

from dance_tpu.data import AnnData, MuData


def test_mudata_var_slicing():
    """Global var-axis slicing routes columns to their modalities."""
    rng = np.random.default_rng(0)
    m1 = AnnData(rng.random((10, 4)).astype(np.float32),
                 var={"tag": list("wxyz")}, obs={"c": range(10)})
    m1.var_names = [f"a{i}" for i in range(4)]
    m2 = AnnData(rng.random((10, 6)).astype(np.float32))
    m2.var_names = [f"b{i}" for i in range(6)]
    md = MuData({"mod1": m1, "mod2": m2})
    # boolean mask over the 10 global vars: keep a0,a1 and b4,b5
    mask = np.array([1, 1, 0, 0, 0, 0, 0, 0, 1, 1], bool)
    sub = md[:, mask]
    assert sub["mod1"].n_vars == 2 and list(sub["mod1"].var_names) == ["a0", "a1"]
    assert sub["mod2"].n_vars == 2 and list(sub["mod2"].var_names) == ["b4", "b5"]
    # by name, combined with obs slicing
    sub2 = md[np.arange(5), ["a2", "b0"]]
    assert sub2.n_obs == 5
    assert sub2["mod1"].shape == (5, 1) and sub2["mod2"].shape == (5, 1)
    np.testing.assert_allclose(sub2["mod2"].X, m2.X[:5, [0]])
    # integer positions + plain slice
    assert md[:, 3:7]["mod1"].n_vars == 1 and md[:, 3:7]["mod2"].n_vars == 3
    with pytest.raises(KeyError):
        md[:, ["nope"]]
    with pytest.raises(IndexError):
        md[:, np.ones(3, bool)]

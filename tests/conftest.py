"""Shared test fixtures.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
exercised without TPU hardware (SURVEY.md §4 implication note).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import numpy as np
import pytest


@pytest.fixture
def cpu_mesh8():
    """8-device mesh, or skip when the environment pins a single device.

    The axon sitecustomize initializes the JAX backend at interpreter startup,
    which defeats xla_force_host_platform_device_count; use ./run_tests.sh to
    run the suite on a genuine 8-device CPU mesh."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices (run via ./run_tests.sh for the CPU mesh)")
    from dance_tpu.parallel.mesh import get_mesh
    return get_mesh(shape=(4, 2), axis_names=("dp", "tp"))


@pytest.fixture
def assert_ary_isclose():
    def assert_(x, y, rtol=1e-5, atol=1e-8):
        x, y = np.asarray(x), np.asarray(y)
        assert x.shape == y.shape, f"shape mismatch: {x.shape} vs {y.shape}"
        np.testing.assert_allclose(x, y, rtol=rtol, atol=atol)

    return assert_


@pytest.fixture
def toy_adata():
    from dance_tpu.data import AnnData
    rng = np.random.default_rng(0)
    X = rng.poisson(2.0, size=(50, 20)).astype(np.float32)
    return AnnData(
        X=X,
        obs={"cell_type": rng.choice(["a", "b", "c"], 50)},
        var={"gene_symbol": [f"g{i}" for i in range(20)]},
    )

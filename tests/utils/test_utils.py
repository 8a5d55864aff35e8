"""Utils tier: matrix ops parity, profiling, checkpointing."""

import numpy as np
import pytest


def test_matrix_normalize(assert_ary_isclose):
    from dance_tpu.utils.matrix import normalize
    x = np.random.default_rng(0).random((10, 5)).astype(np.float32)
    assert_ary_isclose(normalize(x, mode="normalize", axis=1).sum(1), np.ones(10),
                       rtol=1e-5, atol=1e-5)
    std = normalize(x, mode="standardize", axis=0)
    assert abs(std.mean()) < 1e-5
    mm = normalize(x, mode="minmax", axis=0)
    assert mm.min() >= 0 and mm.max() <= 1 + 1e-6
    l2 = normalize(x, mode="l2", axis=1)
    assert_ary_isclose((l2 ** 2).sum(1), np.ones(10), rtol=1e-5, atol=1e-5)


def test_pairwise_distance_parity():
    from scipy.spatial.distance import cdist

    from dance_tpu.utils.matrix import pairwise_distance
    x = np.random.default_rng(1).random((20, 6)).astype(np.float32)
    np.testing.assert_allclose(pairwise_distance(x, dist_func="euclidean"),
                               cdist(x, x), rtol=1e-3, atol=2e-3)


def test_stage_timer():
    from dance_tpu.utils.profile import StageTimer
    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    assert "a" in t.summary()
    assert "(n=2)" in t.report()


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from dance_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
    state = {"params": {"w": jnp.ones((3, 2))}, "step": 7}
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state)
    back = load_checkpoint(path)
    assert back["step"] == 7
    np.testing.assert_allclose(np.asarray(back["params"]["w"]), np.ones((3, 2)))


def test_compose_timings(toy_adata):
    from dance_tpu.data import Data
    from dance_tpu.transforms import Compose, Log1P, NormalizeTotal
    d = Data(toy_adata.copy(), train_size="all")
    pipe = Compose(NormalizeTotal(max_fraction=1.0), Log1P())
    pipe(d)
    assert set(pipe.timings) == {"NormalizeTotal", "Log1P"}

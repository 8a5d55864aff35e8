"""Data object tests (parity model: tests/data/test_data.py in the reference)."""

import numpy as np
import pytest
import scipy.sparse as sp

from dance_tpu.data import AnnData, Data, MuData


@pytest.fixture
def adata():
    rng = np.random.default_rng(0)
    X = rng.random((10, 4)).astype(np.float32)
    a = AnnData(X=X, obs={"label": list("aabbccddee")},
                var={"sym": [f"g{i}" for i in range(4)]})
    a.obsm["feat"] = rng.random((10, 3)).astype(np.float32)
    return a


def test_splits_default(adata):
    d = Data(adata.copy(), train_size=6, val_size=2, test_size=-1)
    assert d.train_idx == list(range(6))
    assert d.val_idx == [6, 7]
    assert d.test_idx == [8, 9]
    mask = d.get_split_mask("train")
    assert mask.sum() == 6


def test_splits_all(adata):
    d = Data(adata.copy(), train_size="all")
    assert d.train_idx == list(range(10))
    assert d.val_idx is None


def test_splits_range(adata):
    d = Data(adata.copy(), split_index_range_dict={"ref": (0, 4), "query": (4, 10)})
    assert d.get_split_idx("ref") == [0, 1, 2, 3]
    assert len(d.get_split_idx("query")) == 6
    with pytest.raises(KeyError):
        d.get_split_idx("train", error_on_miss=True)


def test_config_and_get(adata):
    d = Data(adata.copy(), train_size=6)
    d.set_config(feature_channel=None, feature_channel_type="X",
                 label_channel="label", label_channel_type="obs")
    x, y = d.get_train_data()
    assert x.shape == (6, 4)
    assert y.shape == (6,)
    with pytest.raises(KeyError):
        d.set_config(feature_channel="feat")  # conflict without overwrite
    d.set_config(overwrite=True, feature_channel="feat", feature_channel_type="obsm")
    x = d.get_x("train")
    assert x.shape == (6, 3)


def test_get_feature_types(adata):
    d = Data(adata.copy(), train_size=6)
    assert isinstance(d.get_feature(channel_type="X", return_type="numpy"), np.ndarray)
    spm = d.get_feature(channel_type="X", return_type="sparse")
    assert sp.issparse(spm)
    j = d.get_feature(channel_type="X", return_type="jax", split_name="train")
    assert j.shape == (6, 4)
    import torch
    t = d.get_feature(channel_type="X", return_type="torch")
    assert isinstance(t, torch.Tensor)


def test_append_merge(adata):
    d1 = Data(adata.copy(), train_size=6, val_size=0, test_size=4)
    d2 = Data(adata.copy(), train_size=10)
    d1.append(d2, mode="merge")
    assert d1.shape[0] == 20
    assert d1.train_idx == list(range(6)) + list(range(10, 20))
    assert d1.test_idx == [6, 7, 8, 9]


def test_append_new_split(adata):
    d1 = Data(adata.copy(), train_size="all")
    d2 = Data(adata.copy())
    d1.append(d2, mode="new_split", new_split_name="extra", label_batch=True)
    assert d1.get_split_idx("extra") == list(range(10, 20))
    assert "batch" in d1.data.obs.columns


def test_pop_and_filter(adata):
    d = Data(adata.copy(), train_size=6, val_size=2, test_size=2)
    d.pop(split_name="val")
    assert d.shape[0] == 8
    assert d.train_idx == list(range(6))
    assert d.test_idx == [6, 7]
    mask = np.ones(8, dtype=bool)
    mask[0] = False
    d.filter_cells(mask)
    assert d.shape[0] == 7
    assert d.train_idx == list(range(5))


def test_mudata():
    rng = np.random.default_rng(1)
    m1 = AnnData(X=rng.random((5, 3)).astype(np.float32))
    m2 = AnnData(X=rng.random((5, 2)).astype(np.float32))
    md = MuData({"mod1": m1, "mod2": m2})
    d = Data(md, train_size=3)
    f = d.get_feature(channel_type="X", mod="mod2", split_name="train")
    assert f.shape == (3, 2)
    d.set_config(feature_mod=["mod1", "mod2"], feature_channel=[None, None],
                 feature_channel_type=["X", "X"],
                 label_mod="mod1", label_channel=None, label_channel_type="X")
    x = d.get_x()
    assert isinstance(x, list) and x[0].shape == (5, 3) and x[1].shape == (5, 2)


def test_h5ad_roundtrip(tmp_path, adata):
    from dance_tpu.data import read_h5ad, write_h5ad
    adata.X = sp.csr_matrix(adata.X)
    adata.uns["meta"] = {"k": "v", "n": 3}
    p = tmp_path / "t.h5ad"
    write_h5ad(adata, p)
    back = read_h5ad(p)
    assert back.shape == adata.shape
    np.testing.assert_allclose(back.X.toarray(), adata.X.toarray(), rtol=1e-6)
    assert list(back.obs["label"]) == list(adata.obs["label"])
    assert back.uns["meta"]["k"] == "v"
    np.testing.assert_allclose(back.obsm["feat"], adata.obsm["feat"], rtol=1e-6)


def test_anndata_adaptor(adata):
    import warnings

    from dance_tpu.transforms import Log1P
    from dance_tpu.transforms.base import AnnDataAdaptor
    a = adata.copy()
    before = np.asarray(a.X).copy()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        out = AnnDataAdaptor(Log1P())(a)
    np.testing.assert_allclose(out.X, np.log1p(before), rtol=1e-5)


def test_add_mod_and_transform():
    from dance_tpu.data import AnnData, Data, MuData
    from dance_tpu.transforms import Log1P
    rng = np.random.default_rng(0)
    m1 = AnnData(rng.poisson(2, (6, 4)).astype(np.float32))
    m2 = AnnData(rng.poisson(2, (6, 3)).astype(np.float32))
    before = np.asarray(m2.X).copy()
    d = Data(MuData({"mod1": m1, "mod2": m2}))
    Log1P(mod="mod2")(d)
    np.testing.assert_allclose(d.data.mod["mod2"].X, np.log1p(before), rtol=1e-5)
    # mod1 untouched
    assert (np.asarray(d.data.mod["mod1"].X) % 1 == 0).all()


def test_h5mu_roundtrip(tmp_path):
    from dance_tpu.data import AnnData, MuData, read_h5mu, write_h5mu
    rng = np.random.default_rng(2)
    m1 = AnnData(rng.random((5, 3)).astype(np.float32),
                 obs={"ct": list("aabbc")})
    m2 = AnnData(sp.csr_matrix(rng.random((5, 2)).astype(np.float32)))
    md = MuData({"mod1": m1, "mod2": m2}, uns={"k": 1})
    p = tmp_path / "t.h5mu"
    write_h5mu(md, p)
    back = read_h5mu(p)
    assert set(back.mod) == {"mod1", "mod2"}
    np.testing.assert_allclose(back.mod["mod1"].X, m1.X, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(back.mod["mod2"].X.todense()),
                               np.asarray(m2.X.todense()), rtol=1e-6)
    assert back.uns["k"] == 1


def test_append_mixed_sparse(adata):
    d1 = Data(adata.copy(), train_size="all")
    a2 = adata.copy()
    a2.X = sp.csr_matrix(a2.X)
    d2 = Data(a2)
    d1.append(d2, mode=None)
    assert d1.shape[0] == 20
    assert sp.issparse(d1.data.X)

"""Multimodal family e2e on synthetic paired GEX/ADT data."""

import numpy as np
import pytest

from dance_tpu.datasets.synthetic import multimodal_data


@pytest.fixture(scope="module")
def data():
    return multimodal_data(n_cells=240, n_genes=100, n_prot=25, n_types=3, seed=0)


def _get_xy(d):
    x1_tr = np.log1p(d.get_feature(split_name="train", mod="mod1", channel_type="X"))
    x2_tr = np.log1p(d.get_feature(split_name="train", mod="mod2", channel_type="X"))
    x1_te = np.log1p(d.get_feature(split_name="test", mod="mod1", channel_type="X"))
    x2_te = np.log1p(d.get_feature(split_name="test", mod="mod2", channel_type="X"))
    return x1_tr, x2_tr, x1_te, x2_te


def _baseline_rmse(x2_te):
    return float(np.sqrt(((x2_te - x2_te.mean(0)) ** 2).mean()))


def test_babel_e2e(data):
    from dance_tpu.modules.multi_modality.predict_modality import BabelWrapper
    x1_tr, x2_tr, x1_te, x2_te = _get_xy(data)
    model = BabelWrapper(hidden=32, seed=0)
    model.fit(np.expm1(x1_tr), x2_tr, epochs=60, batch_size=64)
    rmse = model.score(np.expm1(x1_te), x2_te)
    base = _baseline_rmse(x2_te)
    assert rmse < base, f"BABEL rmse {rmse} vs mean-baseline {base}"


def test_cmae_e2e(data):
    from dance_tpu.modules.multi_modality.predict_modality import CMAE
    x1_tr, x2_tr, x1_te, x2_te = _get_xy(data)
    model = CMAE(z_dim=16, hidden=64, seed=0)
    model.fit(x1_tr, x2_tr, epochs=300)
    rmse = model.score(x1_te, x2_te)
    base = _baseline_rmse(x2_te)
    assert rmse < base, f"CMAE rmse {rmse} vs mean-baseline {base}"


def test_scmm_e2e(data):
    from dance_tpu.modules.multi_modality.predict_modality import MMVAE
    x1_tr, x2_tr, x1_te, x2_te = _get_xy(data)
    model = MMVAE(z_dim=16, seed=0)
    model.fit(np.expm1(x1_tr), x2_tr, epochs=80, batch_size=64)
    rmse = model.score(np.expm1(x1_te), x2_te)
    base = _baseline_rmse(x2_te)
    assert rmse < base, f"scMM rmse {rmse} vs mean-baseline {base}"


def test_scmogcn_predict_e2e(data):
    from dance_tpu.modules.multi_modality.predict_modality import ScMoGCNWrapper
    x1_tr, x2_tr, x1_te, x2_te = _get_xy(data)
    model = ScMoGCNWrapper(hidden=32, n_layers=2, seed=0)
    model.fit(np.expm1(x1_tr), x2_tr, x_test=np.expm1(x1_te), epochs=150)
    rmse = model.score(np.expm1(x1_te), x2_te)
    base = _baseline_rmse(x2_te)
    assert rmse < base, f"scMoGNN rmse {rmse} vs mean-baseline {base}"


def test_cmae_matching(data):
    from dance_tpu.modules.multi_modality.match_modality import CMAE
    x1_tr, x2_tr, x1_te, x2_te = _get_xy(data)
    model = CMAE(z_dim=16, hidden=64, seed=0)
    model.fit(x1_tr, x2_tr, epochs=300)
    matching = model.predict_matching(x1_te, x2_te)
    score = model.score_matching(matching)
    # random matching would score ~1/n (~1.4%); require clear signal
    assert score > 0.1, f"CMAE matching score too low: {score}"


def test_jae_joint_embedding(data):
    from dance_tpu.modules.multi_modality.joint_embedding import JAEWrapper
    x1_tr, x2_tr, _, _ = _get_xy(data)
    ct = data.get_feature(split_name="train", mod="mod1", channel="cell_type",
                          channel_type="obs")
    model = JAEWrapper(z_dim=16, seed=0)
    model.fit(x1_tr, x2_tr, cell_type=ct, epochs=150)
    nmi = model.score(None, ct)
    assert nmi > 0.5, f"JAE NMI too low: {nmi}"
    # scIB-parity suite scoring (reference utils/metrics.py:151-190)
    suite = model.score(None, ct, metric="openproblems", return_pred=True)[0]
    for key in ("asw_label", "nmi", "graph_conn", "final_scores"):
        assert key in suite and np.isfinite(suite[key]), key
    assert suite["final_scores"] > 0.5, suite


def test_dcca_joint_embedding(data):
    from dance_tpu.modules.multi_modality.joint_embedding import DCCA
    x1_tr, x2_tr, _, _ = _get_xy(data)
    ct = data.get_feature(split_name="train", mod="mod1", channel="cell_type",
                          channel_type="obs")
    model = DCCA(z_dim=16, seed=0)
    model.fit(x1_tr, x2_tr, epochs=200)
    nmi = model.score(None, ct)
    assert nmi > 0.4, f"DCCA NMI too low: {nmi}"


def test_scmvae_joint_embedding(data):
    from dance_tpu.modules.multi_modality.joint_embedding import scMVAE
    x1_tr, x2_tr, _, _ = _get_xy(data)
    ct = data.get_feature(split_name="train", mod="mod1", channel="cell_type",
                          channel_type="obs")
    # raw counts: the ZINB decoder reconstructs counts (log1p'd internally)
    model = scMVAE(z_dim=16, seed=0, n_centroids=6)
    model.fit(np.expm1(x1_tr), np.expm1(x2_tr), epochs=200)
    nmi = model.score(None, ct)
    assert nmi > 0.4, f"scMVAE NMI too low: {nmi}"


def test_scmogcn_joint_embedding(data):
    from dance_tpu.modules.multi_modality.joint_embedding import ScMoGCNWrapper
    x1_tr, x2_tr, _, _ = _get_xy(data)
    ct = data.get_feature(split_name="train", mod="mod1", channel="cell_type",
                          channel_type="obs")
    model = ScMoGCNWrapper(hidden=32, z_dim=16, seed=0)
    model.fit(x1_tr, x2_tr, cell_type=ct, epochs=100)
    nmi = model.score(None, ct)
    assert nmi > 0.5, f"scMoGNN-JE NMI too low: {nmi}"


def test_scmogcn_matching_contrastive(data):
    """scMoGNN matching trains the reference's symmetric contrastive + aux
    objective (match_modality/scmogcn.py:186-248) over propagated features."""
    from dance_tpu.modules.multi_modality.match_modality import ScMoGCNWrapper
    x1_tr, x2_tr, x1_te, x2_te = _get_xy(data)
    model = ScMoGCNWrapper(latent_dim=32, seed=0)
    model.fit(x1_tr, x2_tr, x1_te, x2_te, epochs=120, batch_size=64)
    idx = np.arange(model.train_size, model.feat_mod1.shape[1])
    v = np.arange(len(idx))
    acc = model.score(idx, labels1=v, labels2=v)
    # random matching would score ~1/n (~1.4%); require clear signal
    assert acc > 0.04, f"scMoGNN matching accuracy too low: {acc}"
    matching = model.predict_matching()
    assert matching.shape == (len(idx), len(idx))


def test_scmogcn_v2_joint_embedding(data):
    """The real v2 protocol (scmogcnv2.py:948-1104): structured latent,
    auxiliary ct/cc heads, feature-sampled minibatches."""
    from dance_tpu.modules.multi_modality.joint_embedding.scmogcnv2 import (
        ScMoGCNWrapperV2)
    x1_tr, x2_tr, _, _ = _get_xy(data)
    ct = data.get_feature(split_name="train", mod="mod1", channel="cell_type",
                          channel_type="obs")
    model = ScMoGCNWrapperV2(seed=0)
    model.fit(x1_tr, x2_tr, cell_type=ct, epochs=60)
    nmi = model.score(None, ct)
    assert nmi > 0.5, f"scMoGNN-v2 NMI too low: {nmi}"
    emb = model.predict()
    assert emb.shape[1] == model.ct_dim + (56 - model.shared_start - 2)


def test_scmogcn_sampled_fit(data):
    """The fit_with_sampling path (scmogcn.py:223-414) as dense on-device
    subgraph gathers."""
    from dance_tpu.modules.multi_modality.predict_modality import ScMoGCNWrapper
    x1_tr, x2_tr, x1_te, x2_te = _get_xy(data)
    model = ScMoGCNWrapper(hidden=32, n_layers=2, seed=0, batch_size=64)
    model.fit(np.expm1(x1_tr), x2_tr, x_test=np.expm1(x1_te), epochs=40,
              sampling=True)
    rmse = model.score(np.expm1(x1_te), x2_te)
    base = _baseline_rmse(x2_te)
    assert rmse < base, f"sampled scMoGNN rmse {rmse} vs mean-baseline {base}"


def test_scmm_matching(data):
    """MMVAE matching path (encode outside apply was a real crash)."""
    from dance_tpu.modules.multi_modality.match_modality import MMVAE
    x1_tr, x2_tr, x1_te, x2_te = _get_xy(data)
    model = MMVAE(z_dim=16, seed=0)
    model.fit(np.expm1(x1_tr), x2_tr, epochs=100, batch_size=64)
    matching = model.predict_matching(np.expm1(x1_te), x2_te)
    score = model.score_matching(matching)
    assert score > 0.05, f"scMM matching score too low: {score}"


def test_scmogcn_bsr_parity():
    """scMoGNN's alternating cell/feature propagation matches element-wise on
    the Pallas bipartite-BSR path (both directions)."""
    import numpy as np

    from dance_tpu.modules.multi_modality.predict_modality import ScMoGCNWrapper

    rng = np.random.default_rng(0)
    n_tr, n_te, d1, d2 = 120, 40, 60, 10
    w = rng.random((d1, d2)).astype(np.float32)
    x_tr = rng.poisson(2, (n_tr, d1)).astype(np.float32)
    x_te = rng.poisson(2, (n_te, d1)).astype(np.float32)
    y_tr = np.log1p(x_tr) @ w
    preds = {}
    for use_bsr in (False, True):
        # dropout masks are laid out differently on CSR vs BSR edge data, so
        # the parity check runs the deterministic (dropout-free) model
        model = ScMoGCNWrapper(hidden=32, n_layers=2, seed=0,
                               edge_dropout=0.0, model_dropout=0.0)
        model.fit(x_tr, y_tr, x_test=x_te, epochs=40, use_bsr=use_bsr)
        preds[use_bsr] = model.predict(x_te)
    np.testing.assert_allclose(preds[False], preds[True], atol=1e-3)


def test_dcca_minibatch_mode():
    """DCCA's scanned minibatch mode (memory-bounded path) trains as well as
    full-batch — the scalability lever for datasets beyond HBM capacity."""
    import numpy as np
    from sklearn.metrics import normalized_mutual_info_score

    from dance_tpu.modules.multi_modality.joint_embedding import DCCA
    from dance_tpu.ops.cluster import kmeans

    rng = np.random.default_rng(0)
    n, d1, d2, k = 150, 60, 30, 3
    c1, c2 = rng.random((k, d1)) * 4, rng.random((k, d2)) * 4
    y = rng.integers(0, k, n)
    x1 = np.log1p(rng.poisson(c1[y] * 3)).astype(np.float32)
    x2 = (rng.poisson(c2[y]) > 0).astype(np.float32)
    model = DCCA(seed=0)
    model.fit(x1, x2, epochs=20, batch_size=48)
    lab = np.asarray(kmeans(model.predict(), k, n_init=5, seed=0).labels)
    nmi = normalized_mutual_info_score(y, lab)
    assert nmi > 0.8, f"minibatch DCCA NMI too low: {nmi}"

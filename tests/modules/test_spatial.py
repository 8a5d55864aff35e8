"""Spatial family e2e tests on synthetic spot data."""

import numpy as np
import pytest

from dance_tpu.datasets.synthetic import spatial_data


@pytest.fixture(scope="module")
def data():
    return spatial_data(n_spots=200, n_genes=100, n_domains=3, seed=0)


def _ari(y_true, y_pred):
    from sklearn.metrics import adjusted_rand_score
    return adjusted_rand_score(np.asarray(y_true).ravel(), np.asarray(y_pred).ravel())


def test_louvain_e2e(data):
    from dance_tpu.modules.spatial.spatial_domain import Louvain
    d = data.copy()
    d.data.obs["label"] = d.data.obs["domain"]
    Louvain.preprocessing_pipeline(dim=20, n_neighbors=10)(d)
    adj, y = d.get_train_data()
    model = Louvain(resolution=1.0)
    model.fit(adj)
    assert _ari(y, model.predict()) > 0.2


def test_spagcn_e2e(data):
    from dance_tpu.modules.spatial.spatial_domain import SpaGCN
    d = data.copy()
    d.data.obs["label"] = d.data.obs["domain"]
    SpaGCN.preprocessing_pipeline(alpha=1, beta=9, dim=20)(d)
    (embed, adj, adj_2d), y = d.get_train_data()
    model = SpaGCN(seed=0)
    l = model.search_l(0.5, adj_2d)
    model.set_l(l)
    model.fit((embed, adj_2d), epochs=200, res=0.8)
    ari = _ari(y, model.predict((embed, adj_2d)))
    assert ari > 0.25, f"SpaGCN ARI too low: {ari}"


def test_stagate_e2e(data):
    from dance_tpu.modules.spatial.spatial_domain import Stagate
    d = data.copy()
    d.data.obs["label"] = d.data.obs["domain"]
    Stagate.preprocessing_pipeline(n_top_genes=80, model_name="knn", n_neighbors=6)(d)
    (x, adj), y = d.get_train_data()
    model = Stagate(hidden_dims=(x.shape[1], 64, 16), seed=0)
    model.fit((x, adj), epochs=150, n_clusters=3)
    ari = _ari(y, model.predict())
    assert ari > 0.25, f"STAGATE ARI too low: {ari}"


def test_efnst_e2e(data):
    from dance_tpu.modules.spatial.spatial_domain import EfNsSTRunner
    d = data.copy()
    d.data.obs["label"] = d.data.obs["domain"]
    EfNsSTRunner.preprocessing_pipeline(pca_n_comps=20, k=6)(d)
    (pca_feat, img_feat, adj), y = d.get_train_data()
    concat = np.concatenate([pca_feat, img_feat], axis=1)
    model = EfNsSTRunner(n_clusters=3, z_dim=16, seed=0)
    model.fit(concat_X=concat, graph_dict=adj, epochs=100, dec_epochs=40)
    ari = _ari(y, model.predict())
    assert ari > 0.2, f"EfNST ARI too low: {ari}"


@pytest.fixture(scope="module")
def deconvo_data():
    """Reference cells + synthetic mixtures with known portions."""
    from dance_tpu.datasets.synthetic import synthetic_expression
    rng = np.random.default_rng(0)
    n_ref, n_genes, k = 150, 80, 3
    x_ref, labels = synthetic_expression(n_ref, n_genes, k, seed=1, effect=6.0)
    n_spots = 60
    portions = rng.dirichlet(np.ones(k), n_spots)
    profiles = np.stack([x_ref[labels == c].mean(0) for c in range(k)])
    x_mix = rng.poisson(portions @ profiles * 3).astype(np.float32)
    return x_ref, labels, x_mix, portions, profiles


def test_spatialdecon_e2e(deconvo_data):
    from dance_tpu.modules.spatial.cell_type_deconvo import SpatialDecon
    x_ref, labels, x_mix, portions, profiles = deconvo_data
    model = SpatialDecon(ct_profile=profiles.T, ct_select=[0, 1, 2])
    model.fit(x_mix, lr=1e-2, max_iter=600)
    pred = model.predict()
    mse = ((pred - portions) ** 2).mean()
    assert mse < 0.05, f"SpatialDecon portion MSE too high: {mse}"


def test_spotlight_e2e(deconvo_data):
    from dance_tpu.modules.spatial.cell_type_deconvo import SPOTlight
    x_ref, labels, x_mix, portions, profiles = deconvo_data
    model = SPOTlight(ref_count=x_ref, ref_annot=labels.astype(str),
                      ct_select=[str(c) for c in range(3)], rank=3)
    model.fit(x_mix, max_iter=400)
    pred = model.predict()
    mse = ((pred - portions) ** 2).mean()
    assert mse < 0.1, f"SPOTlight portion MSE too high: {mse}"


def test_card_e2e(deconvo_data):
    import pandas as pd

    from dance_tpu.modules.spatial.cell_type_deconvo import Card
    x_ref, labels, x_mix, portions, profiles = deconvo_data
    rng = np.random.default_rng(0)
    spatial = rng.random((x_mix.shape[0], 2)).astype(np.float32)
    basis = pd.DataFrame(profiles.T, columns=[f"ct{c}" for c in range(3)])
    model = Card(basis)
    model.fit((x_mix, spatial), max_iter=50)
    pred = model.predict()
    mse = ((pred - portions) ** 2).mean()
    assert mse < 0.08, f"CARD portion MSE too high: {mse}"


def test_dstg_e2e(deconvo_data):
    from dance_tpu.modules.spatial.cell_type_deconvo import DSTG
    from dance_tpu.transforms.graph.dstg_graph import compute_dstg_adj
    x_ref, labels, x_mix, portions, profiles = deconvo_data
    rng = np.random.default_rng(0)
    # pseudo-spots from reference cells
    n_pseudo, k = 100, 3
    ps_port = rng.dirichlet(np.ones(k), n_pseudo)
    ps_x = rng.poisson(ps_port @ profiles * 3).astype(np.float32)
    feats = np.concatenate([ps_x, x_mix], axis=0)
    adj = compute_dstg_adj(ps_x, x_mix, k_filter=30, num_cc=10)
    y = np.concatenate([ps_port, np.zeros_like(portions)], axis=0)
    model = DSTG(nhid=32, seed=0)
    model.fit((np.log1p(feats), adj), y, max_epochs=200)
    pred = model.predict()[n_pseudo:]
    mse = ((pred - portions) ** 2).mean()
    assert mse < 0.1, f"DSTG portion MSE too high: {mse}"


def test_stdgcn_e2e(deconvo_data):
    from dance_tpu.modules.spatial.cell_type_deconvo import StdGCN
    x_ref, labels, x_mix, portions, profiles = deconvo_data
    rng = np.random.default_rng(0)
    n_pseudo, k = 100, 3
    ps_port = rng.dirichlet(np.ones(k), n_pseudo)
    ps_x = rng.poisson(ps_port @ profiles * 3).astype(np.float32)
    feats = np.log1p(np.concatenate([ps_x, x_mix], axis=0))
    coords = np.concatenate([np.zeros((n_pseudo, 2)),
                             rng.random((x_mix.shape[0], 2)) * 10], axis=0)
    y = np.concatenate([ps_port, np.zeros_like(portions)], axis=0)
    model = StdGCN(hidden=(64, 32), seed=0)
    model.fit((feats, coords), y, max_epochs=200)
    pred = model.predict()[n_pseudo:]
    mse = ((pred - portions) ** 2).mean()
    assert mse < 0.1, f"stdGCN portion MSE too high: {mse}"


def test_stagate_bsr_parity():
    """STAGATE's fused Pallas GAT path matches the CSR attention path."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import scipy.sparse as sp

    from dance_tpu.modules.spatial.spatial_domain.stagate import _StagateNet
    from dance_tpu.ops.pallas_kernels import bsr_from_scipy
    from dance_tpu.ops.sparse import csr_from_scipy

    rng = np.random.default_rng(0)
    n, d = 150, 20
    adj = sp.random(n, n, density=0.05, random_state=0, dtype=np.float32,
                    format="csr")
    adj.data[:] = 1.0
    adj = adj + sp.eye(n, format="csr", dtype=np.float32)
    x = jnp.asarray(rng.random((n, d), dtype=np.float32))
    net = _StagateNet(hidden_dims=(d, 16, 4))
    params = net.init(jax.random.key(0), csr_from_scipy(adj), x)["params"]
    z_csr, xh_csr = net.apply({"params": params}, csr_from_scipy(adj), x)
    z_bsr, xh_bsr = net.apply({"params": params}, bsr_from_scipy(adj), x)
    np.testing.assert_allclose(np.asarray(z_bsr), np.asarray(z_csr), rtol=2e-3,
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(xh_bsr), np.asarray(xh_csr),
                               rtol=2e-3, atol=2e-3)


def test_stagate_use_bsr_e2e():
    """STAGATE trains on the fused GAT path (RCM-banded) and the embedding
    clusters as well as the CSR path on structured data."""
    import numpy as np

    from dance_tpu.modules.spatial.spatial_domain import Stagate
    from sklearn.metrics import adjusted_rand_score
    from sklearn.neighbors import radius_neighbors_graph

    rng = np.random.default_rng(0)
    n, d, k = 150, 24, 3
    dom = rng.integers(0, k, n)
    xy = (rng.random((n, 2)) + dom[:, None] * 2).astype(np.float32)
    x = (np.eye(k)[dom] @ rng.random((k, d)) * 4
         + rng.random((n, d))).astype(np.float32)
    adj = radius_neighbors_graph(xy, 0.6, mode="connectivity",
                                 include_self=False)
    aris = {}
    for use_bsr in (False, True):
        m = Stagate(hidden_dims=(d, 16, 4), seed=0)
        m.fit((x, adj), epochs=150, n_clusters=k, use_bsr=use_bsr)
        aris[use_bsr] = adjusted_rand_score(dom, m.predict())
    assert aris[True] > 0.6 and aris[False] > 0.6, aris


def test_spagcn_svg_utilities():
    """Moran/Geary vs brute-force loops; refine majority vote; get_svgs e2e
    (parity surface: reference spagcn.py:31-335,:881)."""
    import numpy as np
    from dance_tpu.modules.spatial.spatial_domain.spagcn import (
        Geary_C, Moran_I, calculate_adj_matrix, count_nbr,
        find_neighbor_clusters, rank_genes_groups, refine, search_radius)

    rng = np.random.default_rng(0)
    side = 8
    xs, ys = np.meshgrid(np.arange(side), np.arange(side))
    x, y = xs.ravel().astype(float), ys.ravel().astype(float)
    n = len(x)
    # one spatially-smooth gene, one noise gene
    smooth = (x + y) / (2 * side)
    noise = rng.normal(0, 1, n)
    genes = np.stack([smooth, noise], 1)

    mi = Moran_I(genes, x, y, k=5)
    gc = Geary_C(genes, x, y, k=5)
    assert mi.iloc[0] > 0.5 > abs(mi.iloc[1])
    assert gc.iloc[0] < 0.5 and gc.iloc[1] > 0.7

    # brute-force Moran for the smooth gene matches the vectorized value
    adj = calculate_adj_matrix(x, y)
    w = np.zeros((n, n))
    nbrs = np.argsort(adj, axis=1)[:, :5]
    for i in range(n):
        w[i, nbrs[i]] = 1
    np.fill_diagonal(w, 0)
    xc = smooth - smooth.mean()
    brute = (n / w.sum()) * (xc @ w @ xc) / (xc @ xc)
    np.testing.assert_allclose(mi.iloc[0], brute, rtol=1e-10)

    # refine: an isolated island spot flips to its surroundings' label
    pred = (x >= side / 2).astype(int)
    island = np.where(pred == 0)[0][10]
    pred2 = pred.copy()
    pred2[island] = 1
    refined = np.asarray(refine([str(i) for i in range(n)], pred2.tolist(),
                                adj, shape="hexagon"))
    assert refined[island] == 0
    # spots deep inside a domain never flip
    assert (refined[pred == 1][np.asarray(x[pred == 1] > side - 2)] == 1).all()

    # radius/neighbor helpers behave sensibly on the two-domain layout
    r = search_radius(0, list(range(n)), x, y, pred, start=0.5, end=6.0,
                      num_min=8, num_max=15)
    assert r is not None
    assert count_nbr(0, list(range(n)), x, y, pred, r) >= 8
    assert find_neighbor_clusters(0, list(range(n)), x, y, pred, r) == [1]

    # rank_genes_groups: a gene expressed only in the target domain tops the
    # table with a small adjusted p-value
    from dance_tpu.data import AnnData
    expr = rng.poisson(1.0, (n, 5)).astype(float)
    expr[pred == 0, 0] += 10.0
    ad = AnnData(X=expr)
    ad.obs["pred"] = pred
    df = rank_genes_groups(ad, 0, [1], "pred")
    assert str(df.loc[df["pvals_adj"].idxmin(), "genes"]) == "0"
    assert df["pvals_adj"].min() < 1e-6


def test_dstg_split_mask_for_validation():
    import numpy as np
    from dance_tpu.modules.spatial.cell_type_deconvo.dstg import (
        split_mask_for_validation)

    mask = np.zeros(100, bool)
    mask[:60] = True
    train, valid = split_mask_for_validation(mask, valid_ratio=0.3,
                                             random_seed=0)
    assert valid.sum() == 18 and train.sum() == 42
    assert not (train & valid).any()
    assert not (train | valid)[60:].any()
    t2, v2 = split_mask_for_validation(mask, valid_ratio=0.3, random_seed=0)
    assert (t2 == train).all() and (v2 == valid).all()


def test_dstg_bsr_parity(deconvo_data):
    """DSTG's Pallas BSR GCN path matches the CSR path element-wise."""
    import scipy.sparse as sp

    from dance_tpu.modules.spatial.cell_type_deconvo import DSTG

    rng = np.random.default_rng(0)
    n, d, k = 200, 20, 4
    x = rng.random((n, d)).astype(np.float32)
    y = np.zeros((n, k), np.float32)
    y[:140] = rng.dirichlet(np.ones(k), 140)
    adj = sp.random(n, n, density=0.03, random_state=0, format="csr",
                    dtype=np.float32)
    adj = adj + adj.T + sp.eye(n, dtype=np.float32)
    preds = {}
    for use_bsr in (False, True):
        model = DSTG(nhid=16, seed=0)
        model.fit((x, adj), y, max_epochs=10, use_bsr=use_bsr)
        preds[use_bsr] = model.predict()
    np.testing.assert_allclose(preds[False], preds[True], atol=1e-4)


def test_stdgcn_bsr_forward_parity():
    """stdGCN's two-tower forward is permutation-consistent under BSR."""
    import jax
    import jax.numpy as jnp

    from dance_tpu.modules.spatial.cell_type_deconvo.stdgcn import (
        _ConGCN, build_stdgcn_adjacencies)
    from dance_tpu.ops.pallas_kernels import (bsr_from_scipy, rcm_reorder,
                                              unpermute)
    from dance_tpu.ops.sparse import csr_from_scipy

    rng = np.random.default_rng(0)
    n_p, n_r, k = 120, 80, 4
    x = rng.random((n_p + n_r, 25)).astype(np.float32)
    coords = rng.random((n_r, 2)).astype(np.float32) * 10
    a_exp, a_sp = build_stdgcn_adjacencies(x, coords, n_p)
    net = _ConGCN(nhid=16, out_dim=k)
    xj = jnp.asarray(x)
    params = net.init(jax.random.key(0), csr_from_scipy(a_exp),
                      csr_from_scipy(a_sp), xj)["params"]
    out_csr = np.asarray(net.apply({"params": params}, csr_from_scipy(a_exp),
                                   csr_from_scipy(a_sp), xj))
    perm, _ = rcm_reorder(a_exp + a_sp)
    perm = np.asarray(perm)
    out_bsr = np.asarray(net.apply(
        {"params": params}, bsr_from_scipy(a_exp[perm][:, perm]),
        bsr_from_scipy(a_sp[perm][:, perm]), jnp.asarray(x[perm])))
    np.testing.assert_allclose(out_csr, unpermute(perm, out_bsr), atol=1e-4)


def test_stdgcn_bsr_e2e(deconvo_data):
    """stdGCN trains end-to-end through the Pallas BSR towers."""
    from dance_tpu.modules.spatial.cell_type_deconvo import StdGCN

    x_ref, labels, x_mix, portions, profiles = deconvo_data
    rng = np.random.default_rng(0)
    n_pseudo, k = 100, 3
    ps_port = rng.dirichlet(np.ones(k), n_pseudo)
    ps_x = rng.poisson(ps_port @ profiles * 3).astype(np.float32)
    feats = np.log1p(np.concatenate([ps_x, x_mix], axis=0))
    coords = np.concatenate([np.zeros((n_pseudo, 2)),
                             rng.random((x_mix.shape[0], 2)) * 10], axis=0)
    y = np.concatenate([ps_port, np.zeros_like(portions)], axis=0)
    model = StdGCN(hidden=(64, 32), seed=0)
    model.fit((feats, coords), y, max_epochs=200, use_bsr=True)
    pred = model.predict()[n_pseudo:]
    mse = ((pred - portions) ** 2).mean()
    assert mse < 0.1, f"BSR-path stdGCN portion MSE too high: {mse}"

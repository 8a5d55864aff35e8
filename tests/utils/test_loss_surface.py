"""Reference-named loss/matrix surface: numeric parity vs the torch reference
formulas (dance/utils/loss.py:10-842, matrix.py:101-163)."""

import numpy as np
import pytest

rng = np.random.default_rng(0)


def test_scvi_likelihoods_match_reference_formula():
    import torch

    from dance_tpu.utils.loss import scvi_log_nb_positive, scvi_log_zinb_positive
    x = rng.poisson(3.0, (20, 10)).astype(np.float32)
    mu = rng.random((20, 10)).astype(np.float32) * 5 + 0.1
    theta = rng.random(10).astype(np.float32) * 2 + 0.1
    pi = rng.normal(0, 1, (20, 10)).astype(np.float32)  # logits

    ours_nb = float(scvi_log_nb_positive(x, mu, np.broadcast_to(theta, mu.shape)))
    xt, mut = torch.from_numpy(x), torch.from_numpy(mu)
    tt = torch.from_numpy(np.broadcast_to(theta, mu.shape).copy())
    log_theta_mu_eps = torch.log(tt + mut + 1e-8)
    ref_nb = (tt * (torch.log(tt + 1e-8) - log_theta_mu_eps)
              + xt * (torch.log(mut + 1e-8) - log_theta_mu_eps)
              + torch.lgamma(xt + tt) - torch.lgamma(tt)
              - torch.lgamma(xt + 1)).mean().item()
    assert abs(ours_nb - ref_nb) < 1e-4

    ours_zinb = float(scvi_log_zinb_positive(x, mu,
                                             np.broadcast_to(theta, mu.shape),
                                             pi))
    pit = torch.from_numpy(pi)
    softplus_pi = torch.nn.functional.softplus(-pit)
    pi_theta_log = -pit + tt * (torch.log(tt + 1e-8) - log_theta_mu_eps)
    case_zero = torch.nn.functional.softplus(pi_theta_log) - softplus_pi
    case_nz = (-softplus_pi + pi_theta_log
               + xt * (torch.log(mut + 1e-8) - log_theta_mu_eps)
               + torch.lgamma(xt + tt) - torch.lgamma(tt)
               - torch.lgamma(xt + 1))
    ref_zinb = torch.where(xt < 1e-8, case_zero, case_nz).mean().item()
    assert abs(ours_zinb - ref_zinb) < 1e-4


def test_nb_zinb_loss_classes():
    from dance_tpu.utils.loss import (NegativeBinomialLoss,
                                      ZeroInflatedNegativeBinomialLoss)
    x = rng.poisson(3.0, (20, 10)).astype(np.float32)
    mu = rng.random((20, 10)).astype(np.float32) * 5 + 0.1
    theta = rng.random((20, 10)).astype(np.float32) * 2 + 0.1
    pi = rng.random((20, 10)).astype(np.float32) * 0.5
    enc = rng.random((20, 4)).astype(np.float32)
    base = float(NegativeBinomialLoss()((mu, theta, enc), x))
    with_l1 = float(NegativeBinomialLoss(l1_lambda=0.1)((mu, theta, enc), x))
    assert with_l1 == pytest.approx(base + 0.1 * np.abs(enc).sum(), rel=1e-5)
    z = float(ZeroInflatedNegativeBinomialLoss()((mu, theta, pi, enc), x))
    assert np.isfinite(z) and z > 0


def test_warmup_iterators():
    from dance_tpu.utils.loss import DelayedLinearWarmup, Warmup
    w = Warmup(inc=0.5, t_max=1.0)
    assert [next(w) for _ in range(4)] == [0.0, 0.5, 1.0, 1.0]
    d = DelayedLinearWarmup(delay=3, inc=0.5, t_max=1.0)
    assert [next(d) for _ in range(5)] == [0.0, 0.0, 0.0, 0.5, 1.0]


def test_distillation_losses_shapes_and_known_values():
    from dance_tpu.utils.loss import (Attention, Correlation, Eucli_dis,
                                      FactorTransfer, KL_diver, L1_dis,
                                      Similarity, cdisttf, kld_loss,
                                      total_variation)
    a = rng.random((8, 5)).astype(np.float32)
    b = rng.random((8, 5)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(Eucli_dis()(a, b)),
                               ((a - b) ** 2).sum(1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(L1_dis()(a, b)),
                               np.abs(a - b).sum(1), rtol=1e-5)
    assert float(Correlation()(a, a)) == 0.0
    assert np.asarray(KL_diver()(a, b, a, b)).shape == (8,)
    assert np.allclose(np.asarray(KL_diver()(a, b, a, b)), 0.0, atol=1e-5)
    assert np.asarray(Attention()(a, b)).shape == (8, )
    assert float(Attention()(a, a)[0]) == pytest.approx(0.0, abs=1e-6)
    # Similarity/FactorTransfer on (n, c, h, w)-style stacks
    f = rng.random((6, 3, 4)).astype(np.float32)
    s = Similarity()([f], [f])
    assert float(s[0]) == pytest.approx(0.0, abs=1e-6)
    assert float(FactorTransfer()(f[:, :, :, None], f[:, :, :, None])) == \
        pytest.approx(0.0, abs=1e-6)
    d = np.asarray(cdisttf(a, b))
    from scipy.spatial.distance import cdist
    np.testing.assert_allclose(d, cdist(a, b), rtol=1e-4, atol=1e-4)
    assert float(total_variation(a)) == pytest.approx(
        np.abs(a[:, :-1] - a[:, 1:]).sum(), rel=1e-5)
    p = rng.dirichlet(np.ones(4), 10).astype(np.float32)
    assert float(kld_loss(p, p)) == pytest.approx(0.0, abs=1e-4)


def test_gmm_loss_matches_scmvae_module():
    """utils.loss.GMM_loss agrees with the scMVAE net's internal gmm_kl."""
    import jax.numpy as jnp

    from dance_tpu.utils.loss import GMM_loss
    n, d, k = 12, 6, 4
    mu = jnp.asarray(rng.normal(0, 1, (n, d)), jnp.float32)
    logvar = jnp.asarray(rng.normal(0, 0.2, (n, d)), jnp.float32)
    z = mu
    mu_c = jnp.asarray(rng.normal(0, 1, (d, k)), jnp.float32)
    var_c = jnp.asarray(rng.random((d, k)) + 0.5, jnp.float32)
    pi = jnp.full((n, k), 1.0 / k)
    # responsibilities from the same formula the reference uses
    log_pdf = -jnp.sum(0.5 * jnp.log(2 * jnp.pi * var_c)[None]
                       + (z[:, :, None] - mu_c[None]) ** 2 / (2 * var_c[None]),
                       axis=1)
    p_c_z = jnp.exp(jnp.log(pi) + log_pdf) + 1e-10
    gamma = p_c_z / p_c_z.sum(1, keepdims=True)
    out = GMM_loss(gamma, (mu_c[None], var_c[None], pi), (mu, logvar))
    assert out.shape == (n,)
    assert np.isfinite(np.asarray(out)).all()


def test_matrix_named_distances():
    from scipy.stats import pearsonr, rankdata, spearmanr

    from dance_tpu.utils.matrix import (euclidean_distance, mean_rank_data,
                                        pearson_distance, spearman_distance)
    a = rng.random(30).astype(np.float32)
    b = rng.random(30).astype(np.float32)
    assert euclidean_distance(a, b) == pytest.approx(
        np.linalg.norm(a - b), rel=1e-5)
    assert pearson_distance(a, b) == pytest.approx(1 - pearsonr(a, b)[0],
                                                   rel=1e-5)
    assert spearman_distance(a, b) == pytest.approx(1 - spearmanr(a, b)[0],
                                                    rel=1e-5)
    ties = np.array([1.0, 2.0, 2.0, 3.0, 0.0])
    np.testing.assert_allclose(mean_rank_data(ties), rankdata(ties))


def test_bipartite_matching_mk3_alias():
    from dance_tpu.utils.metrics import (
        get_bipartite_matching_adjacency_matrix,
        get_bipartite_matching_adjacency_matrix_mk3)
    logits = rng.random((10, 10))
    m1 = get_bipartite_matching_adjacency_matrix(logits.copy())
    m2 = get_bipartite_matching_adjacency_matrix_mk3(logits, copy=True)
    np.testing.assert_allclose(m1, m2)


def test_delete_file(tmp_path):
    from dance_tpu.utils.download import delete_file
    p = tmp_path / "f.txt"
    p.write_text("x")
    delete_file(str(p))
    assert not p.exists()
    delete_file(str(p))  # no-op on missing file

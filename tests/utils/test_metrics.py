

def test_scib_suite():
    """First-party scIB JE suite: separable embedding scores high, shuffled low."""
    import numpy as np

    from dance_tpu.utils.scib_metrics import integration_openproblems_suite

    rng = np.random.default_rng(0)
    n, k = 300, 3
    labels = rng.integers(0, k, n)
    centers = rng.normal(0, 8, (k, 10))
    emb = centers[labels] + rng.normal(0, 1, (n, 10))
    batch = rng.integers(0, 2, n)

    # trajectory: pseudotime along the first embedding axis
    pt = (emb[:, 0] - emb[:, 0].min()) / np.ptp(emb[:, 0])
    s_score, g2m = rng.normal(0, 1, n), rng.normal(0, 1, n)
    good = integration_openproblems_suite(
        emb, labels, batch, emb_pre=emb, s_score=s_score, g2m_score=g2m,
        pseudotime=pt)
    for key in ("asw_label", "asw_batch", "nmi", "graph_conn", "cc_cons",
                "ti_cons", "final_scores"):
        assert key in good, key
        assert np.isfinite(good[key]), key
    assert good["nmi"] > 0.8 and good["asw_label"] > 0.7
    assert good["cc_cons"] > 0.9  # identical pre/post embedding conserves cc

    bad = integration_openproblems_suite(rng.normal(0, 1, (n, 10)), labels, batch)
    assert bad["nmi"] < good["nmi"] and bad["asw_label"] < good["asw_label"]

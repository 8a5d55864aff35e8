"""Device-native linear heads vs the sklearn oracle (SURVEY §2.8: sklearn
stays only as the CPU-side reference; reference stacks at svm.py:13 and
celltypist.py:755-777)."""

import numpy as np
import pytest


def _blobs(n=600, d=40, k=5, seed=0, spread=3.0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((k, d)) * spread
    y = rng.integers(0, k, n)
    x = centers[y] + rng.standard_normal((n, d))
    tr = rng.random(n) < 0.7
    return (x[tr].astype(np.float32), y[tr], x[~tr].astype(np.float32), y[~tr])


def test_device_svc_matches_sklearn_svc():
    from sklearn.svm import SVC
    from dance_tpu.ops.linear_model import DeviceSVC
    xtr, ytr, xte, yte = _blobs()
    ref = SVC(random_state=0).fit(xtr, ytr)
    acc_ref = (ref.predict(xte) == yte).mean()
    dev = DeviceSVC(random_state=0).fit(xtr, ytr)
    acc_dev = (dev.predict(xte) == yte).mean()
    assert acc_dev >= acc_ref - 0.02, (acc_dev, acc_ref)
    p = dev.predict_proba(xte)
    assert p.shape == (len(yte), 5)
    np.testing.assert_allclose(p.sum(1), 1.0, atol=1e-5)


def test_device_svc_rff_fallback_past_kernel_cap():
    """Past kernel_cap the head switches to random Fourier features (linear
    cost in cells) and stays close to the exact-kernel accuracy."""
    from dance_tpu.ops.linear_model import DeviceSVC
    xtr, ytr, xte, yte = _blobs()
    exact = DeviceSVC(random_state=0).fit(xtr, ytr)
    rff = DeviceSVC(random_state=0, kernel_cap=10).fit(xtr, ytr)
    assert rff._x_fit is None and exact._x_fit is not None
    acc_exact = (exact.predict(xte) == yte).mean()
    acc_rff = (rff.predict(xte) == yte).mean()
    assert acc_rff >= acc_exact - 0.05, (acc_rff, acc_exact)


def test_device_logistic_matches_sklearn_lr():
    from sklearn.linear_model import LogisticRegression
    from dance_tpu.ops.linear_model import DeviceLogisticRegression
    xtr, ytr, xte, yte = _blobs(seed=1)
    ref = LogisticRegression(max_iter=1000).fit(xtr, ytr)
    acc_ref = (ref.predict(xte) == yte).mean()
    dev = DeviceLogisticRegression(epochs=1000).fit(xtr, ytr)
    acc_dev = (dev.predict(xte) == yte).mean()
    assert acc_dev >= acc_ref - 0.02, (acc_dev, acc_ref)
    # sklearn layout for the coef surface celltypist's marker extraction uses
    assert dev.coef_.shape == (5, xtr.shape[1])
    assert dev.decision_function(xte).shape == (len(yte), 5)


def test_device_sgd_minibatch():
    from dance_tpu.ops.linear_model import DeviceSGDLogistic
    xtr, ytr, xte, yte = _blobs(seed=2)
    dev = DeviceSGDLogistic(epochs=400, batch_size=128).fit(xtr, ytr)
    assert (dev.predict(xte) == yte).mean() > 0.9


def test_device_svc_binary_two_columns():
    """Binary problems keep the 2-column OvR decision surface the celltypist
    Model consumes (no sklearn 1-d special case)."""
    from dance_tpu.ops.linear_model import DeviceSVC
    xtr, ytr, xte, yte = _blobs(k=2, seed=3)
    dev = DeviceSVC().fit(xtr, ytr)
    assert dev.decision_function(xte).shape == (len(yte), 2)
    assert (dev.predict(xte) == yte).mean() > 0.9

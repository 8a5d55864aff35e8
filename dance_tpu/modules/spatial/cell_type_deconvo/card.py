"""CARD: conditional-autoregressive deconvolution, jitted on device.

Parity target: dance/modules/spatial/cell_type_deconvo/card.py (CARDref
multiplicative V updates with spatial CAR smoothing over a Gaussian kernel of
spot locations, phi grid search by final objective). The per-cell-type Python
update loop becomes one vectorized jnp update inside a lax.fori_loop.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from dance_tpu.modules.base import BaseRegressionMethod
from dance_tpu.settings import logger
from dance_tpu.transforms import (CellTopicProfile, Compose, FilterGenesCommon,
                                  FilterGenesMarker, FilterGenesMatch,
                                  FilterGenesPercentile, SetConfig)
from dance_tpu.typing import Any, LogLevel, Optional, Tuple
from dance_tpu.utils.matrix import normalize, pairwise_distance
from dance_tpu.utils.metrics import resolve_score_func
from dance_tpu.utils.wrappers import as_numpy


@partial(jax.jit, static_argnames=("max_iter",))
def _cardref(X, U, W, phi, V0, max_iter: int, epsilon: float = 0.0):
    """CARD V updates (parity: card.py:44-120); X is genes × spots.

    ``epsilon > 0`` enables the reference's convergence stop inside a
    lax.while_loop: exit past iteration 5 when the V root-mean-square change
    drops below epsilon (card.py:111-118's logic2; the objective-based
    logic1 is subsumed — V stationarity implies objective stationarity)."""
    n_sample = X.shape[1]
    k = U.shape[1]
    has_w = W is not None
    UtX = U.T @ X
    XtU = UtX.T
    UtU = U.T @ U
    diag_UtU = jnp.diag(UtU)
    alpha, beta = 1.0, n_sample / 2.0
    sigma_e2 = 0.1
    if has_w:
        colsum_W = W.sum(1)
        D = jnp.diag(colsum_W)
        L = D - phi * W
        accu_L = L.sum()
    else:
        colsum_W = jnp.zeros(n_sample)
        D = L = jnp.zeros((n_sample, n_sample))
        accu_L = 1.0

    def update(carry):
        i, V, Lambda, b = carry
        vecOne = jnp.ones((n_sample, 1))
        temp = (V.T - b @ vecOne.T) @ L @ (V - vecOne @ b.T)
        Lambda = (jnp.diag(temp) / 2.0 + beta) / (n_sample / 2.0 + alpha + 1.0)
        if has_w:
            b = (V.T @ L).sum(1, keepdims=True) / accu_L
            part1 = sigma_e2 * (D @ V + phi * colsum_W[:, None] @ b.T)
            part2 = sigma_e2 * (phi * W @ V + colsum_W[:, None] @ b.T)
        else:
            part1 = part2 = jnp.zeros_like(V)
        # vectorized per-cell-type multiplicative update
        den = Lambda[None, :] * (V @ UtU) + part1
        num = Lambda[None, :] * XtU + part2
        V_new = V * num / jnp.maximum(den, 1e-12)
        return i + 1, V_new, Lambda, b, V

    def cond(carry):
        i, V, Lambda, b, V_old = carry
        rms = jnp.sqrt(jnp.sum((V - V_old) ** 2) / (n_sample * k))
        converged = (i > 5) & (rms < epsilon)
        return (i < max_iter) & ~converged

    def body(carry):
        i, V, Lambda, b, _ = carry
        return update((i, V, Lambda, b))

    Lambda0 = jnp.full(k, 10.0)
    b0 = jnp.zeros((k, 1))
    init = (jnp.int32(0), V0, Lambda0, b0, jnp.full_like(V0, jnp.inf))
    _, V, Lambda, b, _ = jax.lax.while_loop(cond, body, init)
    # final objective (for phi selection)
    normNMF = (X * X).sum() - 2.0 * jnp.trace(UtX @ V) + jnp.trace(UtU @ (V.T @ V))
    m, n = X.shape
    sig = jnp.maximum(normNMF / (m * n), 1e-12)
    logX = -(m * n) * 0.5 * jnp.log(sig) - 0.5 * (normNMF / sig)
    pred = V / jnp.maximum(V.sum(1, keepdims=True), 1e-12)
    return pred, logX


class Card(BaseRegressionMethod):
    """CARD model (parity: card.py:122)."""

    def __init__(self, basis: pd.DataFrame, random_state: Optional[int] = 42):
        self.basis = basis
        self.best_phi = None
        self.best_obj = -np.inf
        self.random_state = random_state

    @staticmethod
    def preprocessing_pipeline(log_level: LogLevel = "INFO"):
        return Compose(
            CellTopicProfile(ct_select="auto", ct_key="cellType", batch_key=None,
                             split_name="ref", method="mean"),
            FilterGenesMatch(prefixes=["mt-"], case_sensitive=False),
            FilterGenesCommon(split_keys=["ref", "test"]),
            FilterGenesMarker(ct_profile_channel="CellTopicProfile", threshold=1.25),
            FilterGenesPercentile(min_val=1, max_val=99, mode="rv"),
            SetConfig({"feature_channel": [None, "spatial"],
                       "feature_channel_type": ["X", "obsm"],
                       "label_channel": "cell_type_portion"}),
            log_level=log_level,
        )

    def fit(self, inputs: Tuple[np.ndarray, np.ndarray], y: Optional[Any] = None,
            max_iter: int = 100, epsilon: float = 1e-4, sigma: float = 0.1,
            location_free: bool = False):
        x, spatial = (as_numpy(i) for i in inputs)
        x_norm = normalize(np.asarray(x, np.float64), axis=1, mode="normalize")

        if location_free or (spatial == 0).all():
            kernel = None
        else:
            coords = spatial - spatial.min(0)
            coords = coords / max(coords.max(), 1e-12)
            d = pairwise_distance(coords.astype(np.float32))
            kernel = np.exp(-d ** 2 / (2 * sigma ** 2))
            np.fill_diagonal(kernel, 0)
            kernel = jnp.asarray(kernel, jnp.float32)

        basis = self.basis.values.copy().astype(np.float64)
        x_norm = x_norm * 0.1 / x_norm.mean()
        b_mat = jnp.asarray(basis * 0.1 / basis.mean(), jnp.float32)
        rng = np.random.default_rng(self.random_state)
        V0 = jnp.asarray(rng.dirichlet(np.repeat(10, basis.shape[1]),
                                       x_norm.shape[0]), jnp.float32)
        X = jnp.asarray(x_norm.T, jnp.float32)

        for phi in ([0.01, 0.1, 0.3, 0.5, 0.7, 0.9, 0.99] if kernel is not None
                    else [0.0]):
            pred, obj = _cardref(X, b_mat, kernel, phi, V0, max_iter, epsilon)
            obj = float(obj)
            if obj > self.best_obj:
                self.best_obj = obj
                self.best_phi = phi
                self.res = np.asarray(pred)
            logger.info("CARD phi=%.2f obj=%.3e", phi, obj)
        return self

    def predict(self, x: Optional[Any] = None) -> np.ndarray:
        return self.res

    def score(self, x, y, *, score_func=None, return_pred: bool = False, **kwargs):
        y_pred = self.predict(x)
        func = resolve_score_func(score_func or "mse")
        s = func(as_numpy(y), y_pred)
        return (s, y_pred) if return_pred else s

    def fit_score(self, x, y, *, score_func=None, return_pred: bool = False, **kwargs):
        self.fit(x, **kwargs)
        return self.score(None, y, score_func=score_func, return_pred=return_pred)


def obj_func(trac_xxt, UtXV, UtU, VtV, mGene, nSample, b, Lambda, beta, vecOne,
             V, L, alpha, sigma_e2=None):
    """CARD log-posterior (parity: card.py:32). Higher is better."""
    normNMF = trac_xxt - 2.0 * np.trace(UtXV) + np.trace(UtU @ VtV)
    sigma_e2 = normNMF / (mGene * nSample) or sigma_e2
    logX = (-(mGene * nSample) * 0.5 * np.log(sigma_e2)
            - 0.5 * (normNMF / sigma_e2))
    temp = (V.T - b @ vecOne.T) @ L @ (V - vecOne @ b.T)
    logV = (-nSample * 0.5 * np.sum(np.log(Lambda))
            - 0.5 * (np.sum(np.diag(temp) / Lambda)))
    logSigmaL2 = -(alpha + 1.0) * np.sum(np.log(Lambda)) - np.sum(beta / Lambda)
    return logX + logV + logSigmaL2


def CARDref(Xinput, U, W, phi, max_iter, epsilon, V, b, sigma_e2, Lambda):
    """Reference-signature host CARD solver (parity: card.py:43): sequential
    per-cell-type multiplicative V updates (Gauss-Seidel, like the reference)
    with objective/V-change early stopping. Returns ``(pred, obj)``.

    The jitted device path (:func:`_cardref`) is what :class:`Card` uses; this
    function exists for callers of the reference API and for head-to-head
    checks against it.
    """
    V = np.array(V, dtype=np.float64, copy=True)
    b = np.array(b, dtype=np.float64, copy=True)
    Lambda = np.array(Lambda, dtype=np.float64, copy=True)
    nSample = int(Xinput.shape[1])
    mGene = int(Xinput.shape[0])
    k = int(U.shape[1])
    vecOne = np.ones((nSample, 1))
    alpha, beta = 1.0, nSample / 2.0
    trac_xxt = (Xinput * Xinput).sum()

    UtX = U.T @ Xinput
    XtU = UtX.T
    UtXV = UtX @ V
    VtV = V.T @ V
    UtU = U.T @ U
    diag_UtU = np.diag(UtU)
    part1 = np.zeros((nSample, k))
    part2 = np.zeros((nSample, k))
    temp = np.zeros((k, k))
    if W is not None:
        colsum_W = np.sum(W, axis=1)
        D = np.diag(colsum_W)
        L = D - phi * W
        colsum_W = colsum_W.reshape(nSample, 1)
        accu_L = np.sum(L)
    else:
        D = L = np.zeros((nSample, nSample))
        colsum_W = np.zeros((nSample, 1))
        accu_L = 1.0

    obj = obj_func(trac_xxt, UtXV, UtU, VtV, mGene, nSample, b, Lambda, beta,
                   vecOne, V, L, alpha, sigma_e2)
    for i in range(max_iter):
        obj_old = obj
        V_old = V.copy()
        # Lambda reads the previous round's quadratic form (zeros on the
        # first pass). Documented deviation: the reference never recomputes
        # `temp` (card.py:60,92 — it stays zero, freezing Lambda); we update
        # it each round per the CARD paper, matching our device solver.
        Lambda = (np.diag(temp) / 2.0 + beta) / (nSample / 2.0 + alpha + 1.0)
        if W is not None:
            b = np.sum(V.T @ L, axis=1, keepdims=True) / accu_L
            part1 = sigma_e2 * (D @ V + phi * colsum_W @ b.T)
            part2 = sigma_e2 * (phi * W @ V + colsum_W @ b.T)
        for nCT in range(k):
            den = Lambda[nCT] * (V @ UtU[:, nCT]) + part1[:, nCT]
            V[:, nCT] = V[:, nCT] * ((Lambda[nCT] * XtU[:, nCT]
                                      + part2[:, nCT]) / den)
        UtXV = UtX @ V
        VtV = V.T @ V
        temp = (V.T - b @ vecOne.T) @ L @ (V - vecOne @ b.T)
        obj = obj_func(trac_xxt, UtXV, UtU, VtV, mGene, nSample, b, Lambda,
                       beta, vecOne, V, L, alpha)
        rel = abs(obj - obj_old) * 2.0 / abs(obj + obj_old)
        logic1 = (obj > obj_old) and (rel < epsilon)
        logic2 = np.sqrt(np.sum((V - V_old) ** 2) / (nSample * k)) < epsilon
        if (np.isnan(obj) or logic1 or logic2) and i > 5:
            logger.info("CARDref exiting at iteration %d", i)
            break
    pred = V / V.sum(axis=1, keepdims=True)
    return pred, obj

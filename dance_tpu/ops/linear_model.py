"""Device-native linear classification heads (SVM, logistic regression).

TPU-first replacements for the sklearn heads the reference keeps on the host
(reference dance/modules/single_modality/cell_type_annotation/svm.py:13 SVC;
celltypist.py:755-777 LogisticRegression / SGDClassifier): every one-vs-rest
objective is a single ``(cells, feats) @ (feats, classes)`` matmul per step —
MXU-shaped — trained by a jitted ``lax.scan`` Adam loop, so a whole fit is one
dispatch. The RBF kernel is approximated with random Fourier features, keeping
the cost linear in cells (no n×n kernel matrix) and on the MXU. sklearn
remains only as the parity oracle in tests (SURVEY §2.8).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

HI = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# jitted one-vs-rest trainer
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("epochs", "loss", "batch_size", "tol_chunk",
                                   "precision"))
def _fit_ovr(x, t, l2, lr, epochs: int, loss: str, batch_size: int = 0,
             seed: int = 0, tol: float = 0.0, tol_chunk: int = 0,
             precision=HI):
    """Train OvR weights on targets ``t`` in {-1, +1} of shape (n, classes).

    loss: "squared_hinge" (SVM primal) or "logistic" (one-vs-rest LR).
    ``l2`` multiplies ``0.5 * ||W||^2`` (per-sample-mean data term), matching
    sklearn's ``C`` via ``l2 = 1 / (C * n)`` and SGD's ``alpha`` directly.
    ``batch_size > 0`` switches to mini-batch sampling per step (SGD parity).

    ``tol_chunk > 0`` (full-batch only) adds sklearn-style convergence
    stopping: steps run in chunks of ``tol_chunk`` inside one
    ``lax.while_loop``, stopping once the relative objective improvement
    over a chunk drops below ``tol`` (or at ``epochs``, the sklearn
    ``max_iter`` cap) — the fixed-length scan pays for all 1000 steps even
    when the problem converges in 100.
    """
    n, d = x.shape
    W = jnp.zeros((d, t.shape[1]), jnp.float32)
    b = jnp.zeros((t.shape[1],), jnp.float32)
    opt = optax.adam(lr)

    def objective(params, xb, tb):
        W, b = params
        f = jnp.dot(xb, W, precision=precision) + b
        m = tb * f
        if loss == "squared_hinge":
            data = jnp.mean(jnp.sum(jnp.maximum(0.0, 1.0 - m) ** 2, axis=1))
        else:  # logistic
            data = jnp.mean(jnp.sum(jnp.logaddexp(0.0, -m), axis=1))
        return data + 0.5 * l2 * jnp.sum(W * W)

    grad = jax.grad(objective)

    def step(carry, key):
        params, opt_state = carry
        if batch_size:
            idx = jax.random.randint(key, (batch_size,), 0, n)
            xb, tb = x[idx], t[idx]
        else:
            xb, tb = x, t
        g = grad(params, xb, tb)
        updates, opt_state = opt.update(g, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), None

    if tol_chunk and not batch_size:
        n_chunks = -(-epochs // tol_chunk)

        def cond(state):
            i, _, _, prev, cur = state
            return (i < n_chunks) & ((i == 0) | (
                prev - cur > tol * jnp.maximum(jnp.abs(prev), 1e-12)))

        def body(state):
            i, params, opt_state, _, cur = state
            (params, opt_state), _ = jax.lax.scan(
                step, (params, opt_state), None, length=tol_chunk)
            return (i + 1, params, opt_state, cur,
                    objective(params, x, t))

        params0 = (W, b)
        loss0 = objective(params0, x, t)
        _, params, _, _, _ = jax.lax.while_loop(
            cond, body, (0, params0, opt.init(params0), jnp.inf, loss0))
        return params

    keys = jax.random.split(jax.random.key(seed), epochs)
    (params, _), _ = jax.lax.scan(step, ((W, b), opt.init((W, b))), keys)
    return params


@partial(jax.jit, static_argnames=("epochs",))
def _fit_kernel_ovr(K, t, lam, lr, epochs: int):
    """Primal kernel SVM: squared hinge on ``f = K @ a + b`` with the RKHS
    regularizer ``0.5 * lam * a^T K a`` — exact (no feature approximation),
    one n×n×classes matmul pair per step, trained as one jitted scan."""
    a = jnp.zeros((K.shape[0], t.shape[1]), jnp.float32)
    b = jnp.zeros((t.shape[1],), jnp.float32)
    opt = optax.adam(lr)

    def objective(params):
        a, b = params
        Ka = jnp.dot(K, a, precision=HI)
        m = t * (Ka + b)
        data = jnp.mean(jnp.sum(jnp.maximum(0.0, 1.0 - m) ** 2, axis=1))
        return data + 0.5 * lam * jnp.sum(a * Ka)

    grad = jax.grad(objective)

    def step(carry, _):
        params, opt_state = carry
        updates, opt_state = opt.update(grad(params), opt_state, params)
        return (optax.apply_updates(params, updates), opt_state), None

    (params, _), _ = jax.lax.scan(step, ((a, b), opt.init((a, b))), None,
                                  length=epochs)
    return params


@jax.jit
def _rbf_kernel(a, b, gamma):
    d2 = ((a * a).sum(1)[:, None] + (b * b).sum(1)[None]
          - 2.0 * jnp.dot(a, b.T, precision=HI))
    return jnp.exp(-gamma * jnp.maximum(d2, 0.0))


@partial(jax.jit, static_argnames=("n_features",))
def _rff(x, gamma, n_features: int, seed: int):
    """Random Fourier features for the RBF kernel exp(-gamma ||x-y||^2):
    omega ~ N(0, 2*gamma*I), z(x) = sqrt(2/D) cos(x @ omega + beta)."""
    kw, kb = jax.random.split(jax.random.key(seed))
    d = x.shape[1]
    omega = jax.random.normal(kw, (d, n_features)) * jnp.sqrt(2.0 * gamma)
    beta = jax.random.uniform(kb, (n_features,), maxval=2 * jnp.pi)
    proj = jnp.dot(x, omega, precision=HI) + beta
    return jnp.sqrt(2.0 / n_features) * jnp.cos(proj)


# ---------------------------------------------------------------------------
# sklearn-shaped wrappers
# ---------------------------------------------------------------------------

class DeviceLinearClassifier:
    """One-vs-rest linear classifier with the sklearn surface the framework
    uses (``classes_``, ``coef_``, ``decision_function``, ``predict``,
    ``predict_proba``); fit/predict run on device in one dispatch each."""

    loss = "logistic"

    def __init__(self, C: float = 1.0, alpha: float = None, epochs: int = 300,
                 lr: float = 0.05, batch_size: int = 0, seed: int = 0,
                 tol: float = 0.0, tol_chunk: int = 25, precision=HI):
        self.C, self.alpha = C, alpha
        self.epochs, self.lr, self.batch_size, self.seed = (
            epochs, lr, batch_size, seed)
        self.tol, self.tol_chunk = tol, tol_chunk
        self.precision = precision

    # feature map hook (identity here; RFF in DeviceSVC)
    def _map(self, x):
        return jnp.asarray(x, jnp.float32)

    def _prepare(self, x):
        # device arrays pass through untouched (np.asarray on a jax array
        # would download it over the relay just to re-upload)
        if isinstance(x, jax.Array):
            return self._map(x)
        return self._map(np.asarray(x, np.float32))

    def fit(self, x, y):
        y = np.asarray(y)
        self.classes_, y_idx = np.unique(y, return_inverse=True)
        n = len(y)
        t = -np.ones((n, len(self.classes_)), np.float32)
        t[np.arange(n), y_idx] = 1.0
        xd = self._prepare(x)
        l2 = self.alpha if self.alpha is not None else 1.0 / (self.C * n)
        self._W, self._b = _fit_ovr(xd, jnp.asarray(t), float(l2),
                                    float(self.lr), self.epochs, self.loss,
                                    self.batch_size, self.seed,
                                    tol=float(self.tol),
                                    tol_chunk=self.tol_chunk if self.tol else 0,
                                    precision=self.precision)
        return self

    @property
    def coef_(self):
        return np.asarray(self._W).T  # (classes, feats), sklearn layout

    @property
    def intercept_(self):
        return np.asarray(self._b)

    def decision_function(self, x):
        f = jnp.dot(self._prepare(x), self._W, precision=HI) + self._b
        f = np.asarray(f)
        return f.ravel() if f.shape[1] == 1 else f

    def predict(self, x):
        f = np.atleast_2d(self.decision_function(x))
        return self.classes_[f.argmax(1)]

    def predict_proba(self, x):
        # OvR sigmoid, row-normalized (the celltypist/reference convention)
        f = np.atleast_2d(self.decision_function(x))
        p = 1.0 / (1.0 + np.exp(-f))
        return p / np.maximum(p.sum(1, keepdims=True), 1e-12)


class DeviceLogisticRegression(DeviceLinearClassifier):
    """OvR logistic regression (reference: celltypist.py:755 sklearn LR).

    Defaults to sklearn-style convergence stopping (``tol=1e-4`` relative
    objective improvement per 25-step chunk, ``epochs`` = the ``max_iter``
    cap) — lbfgs stops early on convergence, so a fixed-length 1000-step
    scan would pay 5-10× the converged step count."""

    loss = "logistic"

    def __init__(self, C: float = 1.0, epochs: int = 1000, lr: float = 0.05,
                 seed: int = 0, tol: float = 1e-4,
                 precision=jax.lax.Precision.DEFAULT, **kwargs):
        # DEFAULT (single-bf16-pass, f32 accumulate) matmuls: logistic
        # regression is a self-correcting optimization, and HIGHEST costs a
        # 6-pass f32 emulation on the MXU (same rationale as SPOTlight's NMF)
        super().__init__(C=C, epochs=epochs, lr=lr, seed=seed, tol=tol,
                         precision=precision, **kwargs)


class DeviceSGDLogistic(DeviceLinearClassifier):
    """Mini-batch SGD logistic head (reference: celltypist.py:777
    SGDClassifier(loss='log_loss')); batches are sampled inside the scan."""

    loss = "logistic"

    def __init__(self, alpha: float = 1e-4, epochs: int = 1000,
                 batch_size: int = 1000, lr: float = 0.05, seed: int = 0,
                 precision=jax.lax.Precision.DEFAULT):
        super().__init__(alpha=alpha, epochs=epochs, lr=lr,
                         batch_size=batch_size, seed=seed,
                         precision=precision)

    def fit(self, x, y):
        n = x.shape[0]
        if self.batch_size >= n:
            self.batch_size = 0  # full batch: skip the gather
        return super().fit(x, y)


class DeviceSVC(DeviceLinearClassifier):
    """RBF-kernel SVM, squared-hinge OvR, trained as one jitted scan
    (reference: svm.py:13 sklearn SVC(kernel='rbf')).

    Up to ``kernel_cap`` training cells the kernel is exact (primal on the
    n×n Gram matrix — matches sklearn SVC accuracy; Gram+steps are MXU
    matmuls); beyond the cap it switches to random Fourier features so cost
    stays linear in cells."""

    loss = "squared_hinge"

    def __init__(self, C: float = 1.0, gamma="scale", kernel: str = "rbf",
                 n_components: int = 4096, kernel_cap: int = 20_000,
                 epochs: int = 300, lr: float = 0.05,
                 seed: int = 0, random_state=None):
        super().__init__(C=C, epochs=epochs, lr=lr,
                         seed=seed if random_state is None else random_state)
        self.kernel = kernel
        self.gamma = gamma
        self.n_components = n_components
        self.kernel_cap = kernel_cap
        self._gamma_val = None
        self._x_fit = None  # exact-kernel mode keeps the training set

    def _resolve_gamma(self, x):
        if self._gamma_val is None:  # first call = fit: freeze gamma
            if self.gamma == "scale":
                self._gamma_val = float(1.0 / (x.shape[1] * x.var()))
            elif self.gamma == "auto":
                self._gamma_val = float(1.0 / x.shape[1])
            else:
                self._gamma_val = float(self.gamma)
        return self._gamma_val

    def _prepare(self, x):
        x = np.asarray(x, np.float32)
        if self.kernel == "linear":
            return jnp.asarray(x)
        return _rff(jnp.asarray(x), self._resolve_gamma(x), self.n_components,
                    self.seed)

    def fit(self, x, y):
        if not isinstance(x, jax.Array):  # as_device passthrough
            x = np.asarray(x, np.float32)
        if self.kernel != "rbf" or x.shape[0] > self.kernel_cap:
            return super().fit(x, y)
        y = np.asarray(y)
        self.classes_, y_idx = np.unique(y, return_inverse=True)
        n = len(y)
        t = -np.ones((n, len(self.classes_)), np.float32)
        t[np.arange(n), y_idx] = 1.0
        self._x_fit = jnp.asarray(x, jnp.float32)
        K = _rbf_kernel(self._x_fit, self._x_fit, self._resolve_gamma(x))
        self._W, self._b = _fit_kernel_ovr(K, jnp.asarray(t),
                                           1.0 / (self.C * n),
                                           float(self.lr), self.epochs)
        return self

    def decision_function(self, x):
        if self._x_fit is None:
            return super().decision_function(x)
        Kx = _rbf_kernel(jnp.asarray(np.asarray(x, np.float32)), self._x_fit,
                         self._gamma_val)
        return np.asarray(jnp.dot(Kx, self._W, precision=HI) + self._b)


__all__ = ["DeviceLinearClassifier", "DeviceLogisticRegression",
           "DeviceSGDLogistic", "DeviceSVC"]

"""Shared loss library in JAX (parity: dance/utils/loss.py).

The reference implements these as torch ``nn.Module`` losses; here they are
pure functions over jnp arrays (jit/vmap/grad-composable) plus thin callable
wrappers keeping the reference class names. Covers the ZINB/NB family used by
the clustering+imputation model zoo (loss.py:73-144,:780), the DEC-style
clustering KL, distance-probability loss (:44), GMM loss (:578), and the
warmup schedulers (:493-570).
"""

import jax
import jax.numpy as jnp
import numpy as np

EPS = 1e-10


# --------------------------------------------------------------------------
# Negative binomial / ZINB
# --------------------------------------------------------------------------

def nb_nll(x, mean, disp, scale_factor=1.0, reduce: bool = True):
    """Negative binomial negative log-likelihood.

    ``disp`` is the inverse-dispersion (theta); ``scale_factor`` rescales the
    mean per cell (library-size factor). Parity: dance/utils/loss.py:108.
    """
    mean = mean * scale_factor
    disp = jnp.clip(disp, EPS, 1e6)
    t1 = (jax.lax.lgamma(disp + EPS) + jax.lax.lgamma(x + 1.0)
          - jax.lax.lgamma(x + disp + EPS))
    t2 = ((disp + x) * jnp.log1p(mean / (disp + EPS))
          + x * (jnp.log(disp + EPS) - jnp.log(mean + EPS)))
    nll = t1 + t2
    return jnp.mean(nll) if reduce else nll


def zinb_nll(x, mean, disp, pi, scale_factor=1.0, ridge_lambda: float = 0.0,
             reduce: bool = True):
    """Zero-inflated negative binomial NLL (parity: dance/utils/loss.py:73).

    ``pi`` is the dropout (zero-inflation) probability in [0, 1];
    ``ridge_lambda`` adds an L2 penalty on pi.
    """
    mean = mean * scale_factor
    disp = jnp.clip(disp, EPS, 1e6)
    nb_case = nb_nll(x, mean, disp, reduce=False) - jnp.log(1.0 - pi + EPS)
    zero_nb = jnp.power(disp / (disp + mean + EPS), disp)
    zero_case = -jnp.log(pi + (1.0 - pi) * zero_nb + EPS)
    result = jnp.where(x < 1e-8, zero_case, nb_case)
    if ridge_lambda > 0:
        result = result + ridge_lambda * jnp.square(pi)
    return jnp.mean(result) if reduce else result


class NBLoss:
    """Callable wrapper keeping the reference class name (loss.py:108)."""

    def __call__(self, x, mean, disp, scale_factor=1.0):
        return nb_nll(x, mean, disp, scale_factor)


class ZINBLoss:
    """Callable wrapper keeping the reference class name (loss.py:780)."""

    def __init__(self, ridge_lambda: float = 0.0):
        self.ridge_lambda = ridge_lambda

    def __call__(self, x, mean, disp, pi, scale_factor=1.0):
        return zinb_nll(x, mean, disp, pi, scale_factor, self.ridge_lambda)


# --------------------------------------------------------------------------
# DEC-style soft clustering
# --------------------------------------------------------------------------

def soft_assign(z, centers, alpha: float = 1.0):
    """Student-t soft cluster assignment q_ij (DEC)."""
    d2 = jnp.sum((z[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
    q = jnp.power(1.0 + d2 / alpha, -(alpha + 1.0) / 2.0)
    return q / jnp.sum(q, axis=1, keepdims=True)


def target_distribution(q):
    """Sharpened auxiliary target p_ij for the clustering KL."""
    weight = (q ** 2) / jnp.sum(q, axis=0, keepdims=True)
    return weight / jnp.sum(weight, axis=1, keepdims=True)


def cluster_kl_loss(p, q):
    """KL(p || q) averaged over cells."""
    return jnp.mean(jnp.sum(p * (jnp.log(p + EPS) - jnp.log(q + EPS)), axis=1))


# --------------------------------------------------------------------------
# Distance-probability loss (parity: loss.py:44)
# --------------------------------------------------------------------------

def dist_loss(z, min_dist: float = 1.0, max_dist: float = 20.0):
    """Penalize latent pairwise distances collapsing below ``min_dist``."""
    d2 = jnp.sum((z[:, None, :] - z[None, :, :]) ** 2, axis=-1)
    n = z.shape[0]
    mask = 1.0 - jnp.eye(n)
    pen = jnp.square(jnp.maximum(min_dist - jnp.sqrt(d2 + EPS), 0.0))
    return jnp.sum(pen * mask) / jnp.maximum(jnp.sum(mask), 1.0)


# --------------------------------------------------------------------------
# GMM negative log-likelihood (parity: loss.py:578)
# --------------------------------------------------------------------------

def gmm_nll(z, pi, mu, logvar):
    """NLL of latent z under a diagonal GMM with weights pi, means mu, logvar."""
    z = z[:, None, :]
    logp = (-0.5 * (jnp.log(2 * jnp.pi) + logvar + (z - mu) ** 2 / jnp.exp(logvar))).sum(-1)
    logp = logp + jnp.log(pi + EPS)[None, :]
    return -jnp.mean(jax.scipy.special.logsumexp(logp, axis=1))


# --------------------------------------------------------------------------
# Masked reconstruction losses (imputation)
# --------------------------------------------------------------------------

def masked_mse(pred, true, mask):
    mask = mask.astype(pred.dtype)
    return jnp.sum(((pred - true) ** 2) * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def masked_rmse(pred, true, mask):
    return jnp.sqrt(masked_mse(pred, true, mask))


# --------------------------------------------------------------------------
# Similarity / distillation losses (parity: loss.py:614-777)
# --------------------------------------------------------------------------

def cosine_similarity_loss(a, b):
    an = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), EPS)
    bn = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), EPS)
    return 1.0 - jnp.mean(jnp.sum(an * bn, axis=-1))


def sce_loss(a, b, alpha: float = 2.0):
    """Scaled cosine error used by graph-masking models."""
    an = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), EPS)
    bn = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), EPS)
    return jnp.mean((1.0 - jnp.sum(an * bn, axis=-1)) ** alpha)


def kl_divergence(mu, logvar):
    """Standard-normal KL for VAE encoders."""
    return -0.5 * jnp.mean(jnp.sum(1 + logvar - mu ** 2 - jnp.exp(logvar), axis=-1))


# --------------------------------------------------------------------------
# Warmup schedulers (parity: loss.py:493-570) — plain Python iterators used by
# host-side training loops to anneal loss weights.
# --------------------------------------------------------------------------

class SigmoidWarmup:

    def __init__(self, midpoint: int, scale: float = 1.0, maximum: float = 1.0):
        self.midpoint, self.scale, self.maximum = midpoint, scale, maximum
        self.t = 0

    def step(self) -> float:
        self.t += 1
        return float(self.maximum / (1.0 + np.exp(-(self.t - self.midpoint) / self.scale)))


class LinearWarmup:

    def __init__(self, interval: int, maximum: float = 1.0):
        self.interval, self.maximum = interval, maximum
        self.t = 0

    def step(self) -> float:
        self.t += 1
        return float(min(self.t / self.interval, 1.0) * self.maximum)


class NullWarmup:

    def __init__(self, maximum: float = 1.0):
        self.maximum = maximum

    def step(self) -> float:
        return self.maximum


# --------------------------------------------------------------------------
# BABEL paired/quad losses (parity: loss.py:148-344)
# --------------------------------------------------------------------------

class PairedLoss:
    """Two-path translation loss: recon(1->1) + trans(1->2) with given fns."""

    def __init__(self, loss1=None, loss2=None, w1: float = 1.0, w2: float = 1.0):
        self.loss1 = loss1 or (lambda p, t: jnp.mean((p - t) ** 2))
        self.loss2 = loss2 or (lambda p, t: jnp.mean((p - t) ** 2))
        self.w1, self.w2 = w1, w2

    def __call__(self, preds, targets):
        (p11, p12), (t1, t2) = preds, targets
        return self.w1 * self.loss1(p11, t1) + self.w2 * self.loss2(p12, t2)


class QuadLoss:
    """Four-path BABEL loss: both reconstructions + both translations
    (parity: dance/utils/loss.py QuadLoss). ``loss1`` scores modality-1
    outputs (e.g. NB on counts), ``loss2`` modality-2 outputs (MSE/BCE)."""

    def __init__(self, loss1=None, loss2=None, loss1_weight: float = 1.0):
        self.loss1 = loss1 or (lambda p, t: jnp.mean((p - t) ** 2))
        self.loss2 = loss2 or (lambda p, t: jnp.mean((p - t) ** 2))
        self.loss1_weight = loss1_weight

    def __call__(self, preds, targets):
        (p11, p21, p12, p22), (t1, t2) = preds, targets
        return (self.loss1_weight * (self.loss1(p11, t1) + self.loss1(p21, t1))
                + self.loss2(p12, t2) + self.loss2(p22, t2))

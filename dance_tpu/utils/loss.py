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
    """Soft two-sided barrier keeping latent pairwise distances inside
    [min_dist, max_dist]: mean of exp(-(d-min)) + exp(-(max-d))
    (parity: loss.py:832; the reference returns the matrix and callers take
    the mean — folded in here since every caller does).

    Pairwise d² via the Gram identity ``r_i + r_j − 2 z·zᵀ`` — one MXU matmul
    instead of an (n, n, d) broadcast-subtract stream."""
    r = jnp.sum(z * z, axis=-1)
    d2 = r[:, None] + r[None, :] - 2.0 * (z @ z.T)
    d = jnp.sqrt(jnp.maximum(d2, 0.0) + 1e-10)
    return jnp.mean(jnp.exp(-(d - min_dist)) + jnp.exp(-(max_dist - d)))


def binary_ce_logits(logits, target, pos_weight=None):
    """Mean sigmoid binary cross entropy straight from logits.

    Identical math to ``-(w·t·log σ(l) + (1−t)·log(1−σ(l)))`` (the eps-fudged
    sigmoid/log form the reference models write out), restructured as
    ``(1 + (w−1)·t)·softplus(l) − w·t·l`` — ONE transcendental per element
    instead of three, which matters when ``l`` is a dense n×n adjacency
    reconstruction (scTAG/graph-sc/EfNST inner-product decoders over 10⁸
    elements are transcendental-bound in the sigmoid/log form)."""
    sp = jax.nn.softplus(logits)
    if pos_weight is None:
        return jnp.mean(sp - target * logits)
    return jnp.mean((1.0 + (pos_weight - 1.0) * target) * sp
                    - pos_weight * target * logits)


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


# --------------------------------------------------------------------------
# Reference-named loss surface (parity: dance/utils/loss.py:10-842) — the
# remaining names the reference exports, as jnp-native callables.
# --------------------------------------------------------------------------

def kld_loss(p, q):
    """Row-wise KL(p || q) mean (parity: loss.py:10)."""
    return jnp.mean(jnp.sum(p * jnp.log(p / (q + 1e-6)), axis=1))


class BCELoss:
    """BCE over the first element of a prediction tuple (parity: loss.py:22
    — BABEL decoders return (output, ..., encoded))."""

    def __call__(self, x, target):
        p = jnp.clip(x[0], 1e-7, 1 - 1e-7)
        return -jnp.mean(target * jnp.log(p) + (1 - target) * jnp.log1p(-p))


class MSELoss:
    """MSE over the first element of a prediction tuple (parity: loss.py:30)."""

    def __call__(self, x, target):
        return jnp.mean((x[0] - target) ** 2)


class RMSELoss:
    """RMSE over the first element of a prediction tuple (parity: loss.py:37)."""

    def __call__(self, x, target):
        return jnp.sqrt(jnp.mean((x[0] - target) ** 2))


class DistanceProbLoss:
    """weight·pairwise-distance(z, target_z) − logp (parity: loss.py:44)."""

    def __init__(self, weight: float = 5.0, norm: int = 1):
        assert weight > 0
        self.weight = weight
        self.norm = norm

    def __call__(self, x, target_z):
        z, logp = x[:2]
        d = jnp.sum(jnp.abs(z - target_z) ** self.norm, axis=-1) ** (1.0 / self.norm)
        if d.ndim == 2:
            d = jnp.mean(d, axis=1)
        return jnp.mean(self.weight * d - logp)


def total_variation(x):
    """1-shift total variation along the feature axis (parity: loss.py:486)."""
    return jnp.sum(jnp.abs(x[:, :-1] - x[:, 1:]))


def negative_binom_loss(scale_factor: float = 1.0, eps: float = 1e-10,
                        mean: bool = True, debug: bool = False):
    """DCA-style NB loss factory (parity: loss.py:400)."""

    def loss(preds, theta, truth):
        y_pred = preds * scale_factor
        theta = jnp.clip(theta, None, 1e6)
        t1 = (jax.lax.lgamma(theta + eps) + jax.lax.lgamma(truth + 1.0)
              - jax.lax.lgamma(truth + theta + eps))
        t2 = ((theta + truth) * jnp.log1p(y_pred / (theta + eps))
              + truth * (jnp.log(theta + eps) - jnp.log(y_pred + eps)))
        ret = t1 + t2
        return jnp.mean(ret) if mean else ret

    return loss


def zero_inflated_negative_binom_loss(ridge_lambda: float = 0.0,
                                      tv_lambda: float = 0.0, eps: float = 1e-10,
                                      scale_factor: float = 1.0,
                                      debug: bool = False):
    """DCA-style ZINB loss factory (parity: loss.py:445)."""
    nb_loss_func = negative_binom_loss(mean=False, eps=eps,
                                       scale_factor=scale_factor)

    def loss(preds, theta_disp, pi_dropout, truth):
        nb_case = nb_loss_func(preds, theta_disp, truth) - jnp.log(
            1.0 - pi_dropout + eps)
        y_pred = preds * scale_factor
        theta = jnp.clip(theta_disp, None, 1e6)
        zero_nb = jnp.power(theta / (theta + y_pred + eps), theta)
        zero_case = -jnp.log(pi_dropout + (1.0 - pi_dropout) * zero_nb + eps)
        result = jnp.where(truth < 1e-8, zero_case, nb_case)
        result = result + ridge_lambda * pi_dropout ** 2
        result = result + tv_lambda * total_variation(pi_dropout)
        return jnp.mean(result)

    return loss


def scvi_log_nb_positive(x, mu, theta, eps=1e-8):
    """scVI NB log-likelihood, mean-reduced (parity: loss.py:346)."""
    log_theta_mu_eps = jnp.log(theta + mu + eps)
    res = (theta * (jnp.log(theta + eps) - log_theta_mu_eps)
           + x * (jnp.log(mu + eps) - log_theta_mu_eps)
           + jax.lax.lgamma(x + theta) - jax.lax.lgamma(theta)
           - jax.lax.lgamma(x + 1))
    return jnp.mean(res)


def scvi_log_zinb_positive(x, mu, theta, pi, eps=1e-8):
    """scVI ZINB log-likelihood with dropout LOGITS pi, mean-reduced
    (parity: loss.py:372)."""
    if theta.ndim == 1:
        theta = theta[None, :]
    softplus_pi = jax.nn.softplus(-pi)
    log_theta_eps = jnp.log(theta + eps)
    log_theta_mu_eps = jnp.log(theta + mu + eps)
    pi_theta_log = -pi + theta * (log_theta_eps - log_theta_mu_eps)
    case_zero = jax.nn.softplus(pi_theta_log) - softplus_pi
    case_non_zero = (-softplus_pi + pi_theta_log
                     + x * (jnp.log(mu + eps) - log_theta_mu_eps)
                     + jax.lax.lgamma(x + theta) - jax.lax.lgamma(theta)
                     - jax.lax.lgamma(x + 1))
    res = jnp.where(x < eps, case_zero, case_non_zero)
    return jnp.mean(res)


class NegativeBinomialLoss:
    """NB loss over a (mean, dispersion, ..., encoded) tuple
    (parity: loss.py:73)."""

    def __init__(self, scale_factor: float = 1.0, eps: float = 1e-10,
                 l1_lambda: float = 0.0, mean: bool = True):
        self.loss = negative_binom_loss(scale_factor=scale_factor, eps=eps,
                                        mean=mean)
        self.l1_lambda = l1_lambda

    def __call__(self, preds, target):
        mean_, theta = preds[:2]
        l = self.loss(mean_, theta, target)
        if self.l1_lambda:
            l = l + self.l1_lambda * jnp.abs(preds[-1]).sum()
        return l


class ZeroInflatedNegativeBinomialLoss:
    """ZINB loss over a (mean, dispersion, dropout, ..., encoded) tuple
    (parity: loss.py:108)."""

    def __init__(self, ridge_lambda: float = 0.0, tv_lambda: float = 0.0,
                 l1_lambda: float = 0.0, eps: float = 1e-10,
                 scale_factor: float = 1.0, debug: bool = True):
        self.loss = zero_inflated_negative_binom_loss(
            ridge_lambda=ridge_lambda, tv_lambda=tv_lambda, eps=eps,
            scale_factor=scale_factor)
        self.l1_lambda = l1_lambda

    def __call__(self, preds, target):
        mean_, theta, pi = preds[:3]
        l = self.loss(mean_, theta, pi, target)
        if self.l1_lambda:
            l = l + self.l1_lambda * jnp.abs(preds[-1]).sum()
        return l


class Warmup:
    """Linear deterministic warm-up iterator (parity: loss.py:493)."""

    def __init__(self, inc: float = 5e-3, t_max: float = 1.0):
        self.t, self.t_max, self.inc, self.counter = 0.0, t_max, inc, 0

    def __iter__(self):
        return self

    def __next__(self):
        retval = self.t
        self.t = min(self.t + self.inc, self.t_max)
        self.counter += 1
        return retval

    step = __next__


class DelayedLinearWarmup:
    """Linear warm-up that stays at 0 for ``delay`` steps (parity: loss.py:517)."""

    def __init__(self, delay: int = 2000, inc: float = 5e-3, t_max: float = 1.0):
        self.t, self.t_max, self.inc = 0.0, t_max, inc
        self.delay, self.counter = delay, 0

    def __iter__(self):
        return self

    def __next__(self):
        self.counter += 1
        retval = self.t
        if self.counter >= self.delay:
            self.t = min(self.t + self.inc, self.t_max)
        return retval

    step = __next__


class PairedLossInvertible:
    """Paired loss with an invertible-bottleneck alignment term
    (parity: loss.py:202)."""

    def __init__(self, loss1=NegativeBinomialLoss,
                 loss2=ZeroInflatedNegativeBinomialLoss,
                 loss3=DistanceProbLoss,
                 link_func=lambda x, y: jnp.mean(jnp.abs(x - y)),
                 link_strength: float = 1e-3, inv_strength: float = 1.0):
        self.loss1, self.loss2, self.loss3 = loss1(), loss2(), loss3()
        self.link = link_strength
        self.link_f = link_func
        self.link_warmup = DelayedLinearWarmup(delay=1000, inc=5e-3,
                                               t_max=link_strength)
        self.inv_warmup = DelayedLinearWarmup(delay=2000, inc=5e-3,
                                              t_max=inv_strength)

    def __call__(self, preds, target):
        preds1, preds2, (enc1_pred, enc2_pred) = preds
        target1, target2 = target
        retval = self.loss1(preds1, target1) + self.loss2(preds2, target2)
        if self.link > 0:
            lw = next(self.link_warmup)
            if lw > 1e-6:
                retval = retval + lw * jnp.mean(
                    self.link_f(preds1[-1], preds2[-1]))
        iw = next(self.inv_warmup)
        retval = retval + iw * (self.loss3(enc1_pred, enc2_pred[0])
                                + self.loss3(enc2_pred, enc1_pred[0]))
        return retval


def GMM_loss(gamma, c_params, z_params):
    """GMM-prior ELBO KL term (parity: loss.py:578). ``c_params`` =
    (mu_c (D,K), var_c (D,K), pi (N,K)); ``z_params`` = (mu, logvar)."""
    mu_c, var_c, pi = c_params
    mu, logvar = z_params
    mu_e, lv_e = mu[:, :, None], logvar[:, :, None]
    logpzc = -0.5 * jnp.sum(
        gamma * jnp.sum(jnp.log(2 * jnp.pi) + jnp.log(var_c)
                        + jnp.exp(lv_e) / var_c
                        + (mu_e - mu_c) ** 2 / var_c, axis=1), axis=1)
    logpc = jnp.sum(gamma * jnp.log(pi), axis=1)
    qentropy = -0.5 * jnp.sum(1 + logvar + jnp.log(2 * jnp.pi), axis=1)
    logqcx = jnp.sum(gamma * jnp.log(gamma), axis=1)
    return -logpzc - logpc + qentropy + logqcx


# -- DCCA knowledge-distillation attention-transfer family (loss.py:614-778) --

class Eucli_dis:
    """Per-cell squared euclidean distance (parity: loss.py:614)."""

    def __call__(self, g_s, g_t):
        return jnp.sum((g_s - g_t) ** 2, axis=1)


class L1_dis:
    """Per-cell L1 distance (parity: loss.py:629)."""

    def __call__(self, g_s, g_t):
        return jnp.sum(jnp.abs(g_s - g_t), axis=1)


def _l2_normalize(x, axis):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), 1e-12)


class NSTLoss:
    """Neuron-selectivity-transfer polynomial-kernel MMD (parity: loss.py:645)."""

    def __call__(self, g_s, g_t):
        return [self.nst_loss(f_s, f_t) for f_s, f_t in zip(g_s, g_t)]

    def nst_loss(self, f_s, f_t):
        f_s = _l2_normalize(f_s.reshape(f_s.shape[0], f_s.shape[1], -1), 2)
        f_t = _l2_normalize(f_t.reshape(f_t.shape[0], f_t.shape[1], -1), 2)
        return (self.poly_kernel(f_s, f_s).mean()
                - 2 * self.poly_kernel(f_s, f_t).mean())

    @staticmethod
    def poly_kernel(a, b):
        return jnp.sum(a[:, None] * b[:, :, None], axis=-1) ** 2


class FactorTransfer:
    """Factor-transfer distillation loss (parity: loss.py:677)."""

    def __init__(self, p1: int = 2, p2: int = 1):
        self.p1, self.p2 = p1, p2

    def __call__(self, f_s, f_t):
        fs, ft = self.factor(f_s), self.factor(f_t)
        diff = fs - ft
        return (jnp.abs(diff).mean() if self.p2 == 1
                else (diff ** self.p2).mean())

    def factor(self, f):
        return _l2_normalize((f ** self.p1).mean(1).reshape(f.shape[0], -1), 1)


class Similarity:
    """Similarity-preserving distillation (parity: loss.py:706)."""

    def __call__(self, g_s, g_t):
        return [self.similarity_loss(f_s, f_t) for f_s, f_t in zip(g_s, g_t)]

    @staticmethod
    def similarity_loss(f_s, f_t):
        bsz = f_s.shape[0]
        gs = _l2_normalize(f_s.reshape(bsz, -1) @ f_s.reshape(bsz, -1).T, 1)
        gt = _l2_normalize(f_t.reshape(bsz, -1) @ f_t.reshape(bsz, -1).T, 1)
        return jnp.sum((gt - gs) ** 2) / (bsz * bsz)


class Correlation:
    """Correlation-congruence distillation (parity: loss.py:733)."""

    def __call__(self, f_s, f_t):
        delta = jnp.abs(f_s - f_t)
        return jnp.mean(jnp.sum(delta[:-1] * delta[1:], axis=1))


class KL_diver:
    """KL between two diagonal Gaussians given (mean, SCALE) pairs — the
    reference passes logvar tensors straight as Normal scale (loss.py:750);
    matched exactly."""

    def __call__(self, mean_1, scale_1, mean_2, scale_2):
        s1 = jnp.maximum(scale_1, 1e-12)
        s2 = jnp.maximum(scale_2, 1e-12)
        return jnp.sum(jnp.log(s2 / s1)
                       + (s1 ** 2 + (mean_1 - mean_2) ** 2) / (2 * s2 ** 2)
                       - 0.5, axis=1)


class Attention:
    """Attention-transfer loss (parity: loss.py:761)."""

    def __init__(self, p: int = 2):
        self.p = p

    def __call__(self, g_s, g_t):
        diff = _l2_normalize(g_s, 1) - _l2_normalize(g_t, 1)
        return jnp.sum(jnp.linalg.norm(diff, axis=1, keepdims=True), axis=1)


def cdisttf(data_1, data_2):
    """Pairwise euclidean distance matrix (parity: loss.py:840)."""
    d2 = (jnp.sum(data_1 ** 2, 1)[:, None] + jnp.sum(data_2 ** 2, 1)[None, :]
          - 2 * data_1 @ data_2.T)
    return jnp.sqrt(jnp.maximum(d2, 0.0))


# --------------------------------------------------------------------------
# reference-named module-level losses (dcca.py:?/scmvae.py:54-116 expose these
# as plain functions; jnp equivalents, per-sample reductions preserved)
# --------------------------------------------------------------------------

def binary_cross_entropy(recon_x, x):
    """Per-sample summed BCE (parity: scmvae.py:54)."""
    recon_x = jnp.asarray(recon_x)
    x = jnp.asarray(x)
    return -jnp.sum(x * jnp.log(recon_x + 1e-8)
                    + (1 - x) * jnp.log(1 - recon_x + 1e-8), axis=1)


def log_nb_positive(x, mu, theta, eps=1e-8):
    """NB log-likelihood, scvi parameterization (parity: scmvae.py:76)."""
    return scvi_log_nb_positive(jnp.asarray(x), jnp.asarray(mu),
                                jnp.asarray(theta), eps=eps)


def log_zinb_positive(x, mu, theta, pi, eps=1e-8):
    """ZINB log-likelihood, scvi parameterization (parity: scmvae.py:58)."""
    return scvi_log_zinb_positive(jnp.asarray(x), jnp.asarray(mu),
                                  jnp.asarray(theta), jnp.asarray(pi), eps=eps)


def NB_loss(y_true, y_pred, theta, eps=1e-10):
    """Per-sample NEGATED summed NB NLL — the reference returns ``-sum``
    (parity: scmvae.py:85-97)."""
    y_true = jnp.asarray(y_true, jnp.float32)
    y_pred = jnp.asarray(y_pred, jnp.float32)
    theta = jnp.asarray(theta, jnp.float32)
    t1 = (jax.scipy.special.gammaln(theta + eps)
          + jax.scipy.special.gammaln(y_true + 1.0)
          - jax.scipy.special.gammaln(y_true + theta + eps))
    t2 = ((theta + y_true) * jnp.log1p(y_pred / (theta + eps))
          + y_true * (jnp.log(theta + eps) - jnp.log(y_pred + eps)))
    return -jnp.sum(t1 + t2, axis=1)


def mse_loss(y_true, y_pred):
    """Per-sample masked (sign of truth) squared error (parity: scmvae.py:99)."""
    y_true = jnp.asarray(y_true, jnp.float32)
    y_pred = jnp.asarray(y_pred, jnp.float32)
    mask = jnp.sign(y_true)
    return jnp.sum(((y_pred - y_true) * mask) ** 2, axis=1)


def poisson_loss(y_true, y_pred):
    """Per-sample summed Poisson NLL (parity: scmvae.py:110)."""
    y_true = jnp.asarray(y_true, jnp.float32)
    y_pred = jnp.asarray(y_pred, jnp.float32)
    return jnp.sum(y_pred - y_true * jnp.log(y_pred + 1e-10)
                   + jax.scipy.special.gammaln(y_true + 1.0), axis=1)


def adjust_learning_rate(init_lr, optimizer, iteration, max_lr, adjust_epoch):
    """Stepwise-decayed LR value (parity: scmvae.py:119). The reference
    mutates a torch optimizer in place; optax schedules are functional, so
    this returns the LR for the given iteration (also usable directly as an
    optax schedule via functools.partial)."""
    return max(init_lr * (0.9 ** (iteration // adjust_epoch)), max_lr)


def get_mean(d, K: int = 100):
    """Mean of a distribution-like object (parity: scmm.py get_mean):
    uses ``.mean`` when available, else draws K samples."""
    mean = getattr(d, "mean", None)
    if mean is not None:
        return mean
    return jnp.mean(d.sample((K,)), axis=0)

"""Non-negative matrix factorization via jitted multiplicative updates.

Replaces torchnmf (SPOTlight, dance/modules/spatial/cell_type_deconvo/
spotlight.py:31,98) and sklearn NMF. Frobenius-loss multiplicative updates are
two matmuls per factor per step — MXU-friendly, fixed iteration count.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

HI = jax.lax.Precision.HIGHEST
EPS = 1e-10


class NMFResult(NamedTuple):
    W: jax.Array  # (n, k)
    H: jax.Array  # (k, m)
    loss: jax.Array


@partial(jax.jit, static_argnames=("n_iter", "precision"))
def _nmf_mu(V, W, H, n_iter: int, precision=HI):
    def step(_, WH):
        W, H = WH
        H = H * (jnp.dot(W.T, V, precision=precision)
                 / (jnp.dot(jnp.dot(W.T, W, precision=precision), H,
                            precision=precision) + EPS))
        W = W * (jnp.dot(V, H.T, precision=precision)
                 / (jnp.dot(W, jnp.dot(H, H.T, precision=precision),
                            precision=precision) + EPS))
        return W, H

    W, H = jax.lax.fori_loop(0, n_iter, step, (W, H))
    loss = jnp.linalg.norm(V - jnp.dot(W, H, precision=HI))
    return W, H, loss


def nmf(V, n_components: int, *, n_iter: int = 200, seed: int = 0,
        W_init=None, H_init=None, W_fixed: bool = False,
        precision=HI) -> NMFResult:
    """NMF V ≈ W H with optional fixed W (NNLS-style regression mode).

    ``precision`` sets the in-loop matmul precision. The HIGHEST default is
    a 6-pass f32 emulation on the TPU MXU; multiplicative updates are
    self-correcting ratio iterations, so callers on the hot path (SPOTlight)
    pass ``jax.lax.Precision.DEFAULT`` (single bf16 pass, ~6× less MXU work)
    — the final reported loss is always computed at HIGHEST.
    """
    V = jnp.asarray(V, jnp.float32)
    n, m = V.shape
    scale = jnp.sqrt(V.mean() / n_components)
    k1, k2 = jax.random.split(jax.random.key(seed))
    W = (jnp.asarray(W_init, jnp.float32) if W_init is not None
         else scale * jnp.abs(jax.random.normal(k1, (n, n_components))))
    H = (jnp.asarray(H_init, jnp.float32) if H_init is not None
         else scale * jnp.abs(jax.random.normal(k2, (n_components, m))))
    if W_fixed:
        W, H, loss = _nmf_mu_fixed_w(V, W, H, n_iter, precision=precision)
    else:
        W, H, loss = _nmf_mu(V, W, H, n_iter, precision=precision)
    return NMFResult(W, H, loss)


@partial(jax.jit, static_argnames=("n_iter", "precision"))
def _nmf_mu_fixed_w(V, W, H, n_iter: int, precision=HI):
    WtV = jnp.dot(W.T, V, precision=HI)
    WtW = jnp.dot(W.T, W, precision=HI)

    def step(_, H):
        return H * (WtV / (jnp.dot(WtW, H, precision=precision) + EPS))

    H = jax.lax.fori_loop(0, n_iter, step, H)
    loss = jnp.linalg.norm(V - jnp.dot(W, H, precision=HI))
    return W, H, loss


def nnls(A, b, n_iter: int = 300):
    """Non-negative least squares min ||A x - b||, x>=0, via mult. updates.

    Supports batched b (m, nrhs). Used by deconvolution heads.
    """
    A = jnp.asarray(A, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    squeeze = b.ndim == 1
    if squeeze:
        b = b[:, None]
    # x solves b ≈ A x, i.e. H in V = W H with V=b, W=A fixed
    result = nmf(b, A.shape[1], n_iter=n_iter, W_init=A, W_fixed=True)
    x = result.H
    return x[:, 0] if squeeze else x


__all__ = ["NMFResult", "nmf", "nnls"]

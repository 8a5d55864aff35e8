"""Shared variational building blocks for the multimodal family."""

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from dance_tpu.nn.zinb_ae import MLPStack, disp_act, mean_act


class GaussianEncoder(nn.Module):
    hidden: Tuple[int, ...]
    z_dim: int

    @nn.compact
    def __call__(self, x):
        h = MLPStack(self.hidden)(x)
        mu = nn.Dense(self.z_dim)(h)
        logvar = nn.Dense(self.z_dim)(h)
        return mu, logvar


def reparameterize(rng, mu, logvar):
    return mu + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mu.shape)


class GaussianDecoder(nn.Module):
    hidden: Tuple[int, ...]
    out_dim: int

    @nn.compact
    def __call__(self, z):
        h = MLPStack(self.hidden)(z)
        return nn.Dense(self.out_dim)(h)


class NBDecoder(nn.Module):
    """Negative-binomial decoder head (mean via softmax×library, disp softplus)."""

    hidden: Tuple[int, ...]
    out_dim: int

    @nn.compact
    def __call__(self, z, library=None):
        h = MLPStack(self.hidden)(z)
        if library is not None:
            scale = nn.softmax(nn.Dense(self.out_dim)(h), axis=-1)
            mean = scale * library
        else:
            mean = mean_act(nn.Dense(self.out_dim)(h))
        disp = disp_act(nn.Dense(self.out_dim)(h))
        return mean, disp


def gaussian_kl(mu, logvar):
    return -0.5 * jnp.sum(1 + logvar - mu ** 2 - jnp.exp(logvar), axis=-1).mean()


__all__ = ["GaussianDecoder", "GaussianEncoder", "NBDecoder", "gaussian_kl",
           "reparameterize"]

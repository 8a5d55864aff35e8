"""ZINB autoencoder backbone shared by the clustering family.

Parity targets: dance/modules/single_modality/clustering/scdeepcluster.py:30-62
(buildNetwork/MeanAct/DispAct) and the equivalent stacks in scDCC/scTAG/scDSC.
The denoising-noise path (sigma) and the three ZINB heads match the reference.
"""

from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def mean_act(x):
    """exp clamped to [1e-5, 1e6] (parity: MeanAct)."""
    return jnp.clip(jnp.exp(x), 1e-5, 1e6)


def disp_act(x):
    """softplus clamped to [1e-4, 1e4] (parity: DispAct)."""
    return jnp.clip(jax.nn.softplus(x), 1e-4, 1e4)


class TorchDense(nn.Module):
    """Dense layer with torch.nn.Linear's default init.

    Kernel: kaiming-uniform(a=sqrt(5)) == U(±sqrt(1/fan_in)); bias:
    U(±1/sqrt(fan_in)). Matching the reference's init closes a measurable
    convergence-speed gap in the ZINB pretrain (benchmarks/parity.py).
    """

    features: int

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        bound = 1.0 / float(fan_in) ** 0.5
        kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in",
                                                       "uniform")

        def bias_init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        return nn.Dense(self.features, kernel_init=kernel_init,
                        bias_init=bias_init)(x)


class MLPStack(nn.Module):
    dims: Tuple[int, ...]
    activation: Callable = nn.relu

    @nn.compact
    def __call__(self, x):
        for d in self.dims:
            x = TorchDense(d)(x)
            x = self.activation(x)
        return x


class ZINBAutoencoder(nn.Module):
    """Encoder -> z -> decoder with ZINB (mean, disp, pi) heads.

    ``sigma`` adds denoising Gaussian noise to the encoder input during the AE
    forward (parity: scdeepcluster.py forwardAE); the clean embedding path
    (``encode``) skips the noise.
    """

    input_dim: int
    z_dim: int
    encode_layers: Tuple[int, ...] = (256, 64)
    decode_layers: Tuple[int, ...] = (64, 256)
    sigma: float = 1.0
    activation: Callable = nn.relu

    def setup(self):
        self.encoder = MLPStack(self.encode_layers, self.activation)
        self.enc_mu = TorchDense(self.z_dim)
        self.decoder = MLPStack(self.decode_layers, self.activation)
        self.dec_mean = TorchDense(self.input_dim)
        self.dec_disp = TorchDense(self.input_dim)
        self.dec_pi = TorchDense(self.input_dim)

    def encode(self, x):
        return self.enc_mu(self.encoder(x))

    def decode_heads(self, z):
        h = self.decoder(z)
        return mean_act(self.dec_mean(h)), disp_act(self.dec_disp(h)), nn.sigmoid(
            self.dec_pi(h))

    def __call__(self, x, noise_rng: Optional[jax.Array] = None):
        """Denoising AE forward: returns (z_clean, mean, disp, pi)."""
        if noise_rng is not None and self.sigma > 0:
            x_noisy = x + self.sigma * jax.random.normal(noise_rng, x.shape, x.dtype)
        else:
            x_noisy = x
        z_noisy = self.enc_mu(self.encoder(x_noisy))
        mean, disp, pi = self.decode_heads(z_noisy)
        z_clean = self.encode(x)
        return z_clean, mean, disp, pi


__all__ = ["MLPStack", "TorchDense", "ZINBAutoencoder", "disp_act", "mean_act"]


class MeanAct:
    """Callable class form of :func:`mean_act` (the reference defines MeanAct
    as an nn.Module in five model files; one shared definition here)."""

    def __call__(self, x):
        return mean_act(x)

    forward = __call__


class DispAct:
    """Callable class form of :func:`disp_act` (reference DispAct)."""

    def __call__(self, x):
        return disp_act(x)

    forward = __call__

"""Shared MLP (parity: dance/models/nn/mlp.py:10 — VanillaMLP).

Flax module with Xavier(-uniform) init + ReLU stack, matching the reference
architecture: Linear(in, h0) ReLU ... Linear(h_last, out).
"""

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp


class VanillaMLP(nn.Module):

    output_dim: int
    hidden_dims: Tuple[int, ...] = (100, 50, 25)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for h in self.hidden_dims:
            x = nn.Dense(h, kernel_init=nn.initializers.xavier_uniform(),
                         dtype=self.dtype)(x)
            x = nn.relu(x)
        return nn.Dense(self.output_dim, kernel_init=nn.initializers.xavier_uniform(),
                        dtype=self.dtype)(x)


def buildNetwork(layers, activation: str = "relu", dtype=None):
    """Dense stack builder (the reference's per-model buildNetwork helpers,
    e.g. scdeepcluster.py/scdcc.py/graphsci.py): returns a flax
    ``nn.Sequential`` of Dense layers with the given activation between
    them (torch's nn.Sequential equivalent)."""
    act = {"relu": nn.relu, "sigmoid": nn.sigmoid, "tanh": nn.tanh,
           "elu": nn.elu, "gelu": nn.gelu}[activation]
    mods = []
    for i in range(1, len(layers)):
        mods.append(nn.Dense(layers[i], dtype=dtype))
        if i < len(layers) - 1:
            mods.append(act)
    return nn.Sequential(mods)

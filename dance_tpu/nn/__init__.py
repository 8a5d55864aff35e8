"""Shared neural building blocks (parity: dance/models/nn/)."""

from dance_tpu.nn.mlp import VanillaMLP

__all__ = ["VanillaMLP"]

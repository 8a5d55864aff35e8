"""Data layer: native AnnData/MuData containers + the split-aware Data wrapper."""

from dance_tpu.data.base import BaseData, Data
from dance_tpu.data.container import AnnData, MuData, Raw, concat
from dance_tpu.data.io import read_h5ad, read_h5mu, write_h5ad, write_h5mu

__all__ = ["AnnData", "BaseData", "Data", "MuData", "Raw", "concat", "read_h5ad",
           "read_h5mu", "write_h5ad", "write_h5mu"]

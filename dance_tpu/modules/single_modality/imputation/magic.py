"""MAGIC: Markov affinity-based graph imputation of cells, on device.

Parity target: dance/modules/single_modality/imputation/magic.py (adaptive
Gaussian kernel on kNN distances, symmetrized Markov matrix, t-step diffusion
of the expression matrix, optional rescaling). The diffusion P^t X is a chain
of dense matmuls on the MXU.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from dance_tpu.modules.base import BaseRegressionMethod
from dance_tpu.transforms import (AnnDataTransform, CellwiseMaskData, Compose,
                                  FilterCellsScanpy, FilterGenesScanpy, SaveRaw,
                                  SetConfig)
from dance_tpu.typing import LogLevel, Optional
from dance_tpu.utils.wrappers import as_numpy


class MAGIC(BaseRegressionMethod):
    """MAGIC model (parity: magic.py:151)."""

    _DISPLAY_ATTRS = ("t", "k", "ka", "epsilon", "rescale")

    def __init__(self, t: int = 3, k: int = 10, ka: int = 4, epsilon: float = 1.0,
                 rescale: int = 99, gpu: int = -1):
        self.t = t
        self.k = k
        self.ka = ka
        self.epsilon = epsilon
        self.rescale = rescale

    @staticmethod
    def preprocessing_pipeline(min_cells: float = 0.1, mask: bool = True,
                               distr: str = "exp", mask_rate: float = 0.1,
                               seed: Optional[int] = None,
                               log_level: LogLevel = "INFO"):
        transforms = [
            FilterGenesScanpy(min_cells=min_cells),
            FilterCellsScanpy(min_counts=1),
            SaveRaw(),
            AnnDataTransform("sc.pp.normalize_total", target_sum=1e4),
            AnnDataTransform("sc.pp.log1p"),
        ]
        if mask:
            transforms.append(CellwiseMaskData(distr=distr, mask_rate=mask_rate,
                                               seed=seed))
        transforms.append(SetConfig({
            "feature_channel": [None, "train_mask"] if mask else [None],
            "feature_channel_type": ["X", "layers"] if mask else ["X"],
            "label_channel": [None, None],
            "label_channel_type": ["X", "raw_X"]}))
        return Compose(*transforms, log_level=log_level)

    @partial(jax.jit, static_argnames=("self",))
    def _impute(self, x):
        # adaptive gaussian kernel from kNN distances
        d2 = ((x ** 2).sum(1)[:, None] + (x ** 2).sum(1)[None, :]
              - 2 * jnp.dot(x, x.T, precision=jax.lax.Precision.HIGHEST))
        d2 = jnp.maximum(d2, 0.0)
        n = x.shape[0]
        k = min(self.k, n - 1)
        ka = min(self.ka, k)
        neg_sorted = -jax.lax.top_k(-d2, k + 1)[0]  # ascending distances (incl self)
        sigma = jnp.sqrt(jnp.maximum(neg_sorted[:, ka], 1e-12)) * self.epsilon
        w = jnp.exp(-d2 / jnp.maximum(sigma[:, None] ** 2, 1e-12))
        # keep only kNN entries
        thresh = neg_sorted[:, k][:, None]
        w = jnp.where(d2 <= thresh, w, 0.0)
        w = (w + w.T) / 2
        p = w / jnp.maximum(w.sum(1, keepdims=True), 1e-12)
        out = x
        for _ in range(self.t):
            out = jnp.dot(p, out, precision=jax.lax.Precision.HIGHEST)
        if self.rescale:
            pct_orig = jnp.percentile(x, self.rescale, axis=0)
            pct_new = jnp.percentile(out, self.rescale, axis=0)
            scale = pct_orig / jnp.maximum(pct_new, 1e-12)
            out = out * jnp.where(x.max(0) > 0, scale, 1.0)[None, :]
        return out

    def fit(self, x, y=None, mask=None):
        x = as_numpy(x).astype(np.float32)
        if mask is not None:
            x = x * as_numpy(mask)
        self.imputed = np.asarray(self._impute(jnp.asarray(x)))
        return self

    def predict(self, x=None, mask=None):
        if x is not None and not hasattr(self, "imputed"):
            self.fit(x, mask=mask)
        return self.imputed

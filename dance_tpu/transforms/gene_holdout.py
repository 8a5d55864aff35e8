"""Target-gene batching for DeepImpute (parity: dance/transforms/gene_holdout.py)."""

import numpy as np

from dance_tpu.registry import register_preprocessor
from dance_tpu.transforms.base import BaseTransform
from dance_tpu.typing import Optional


@register_preprocessor("split", "gene")
class GeneHoldout(BaseTransform):
    """Split genes into target batches; select high-covariance predictor genes
    outside each batch (parity: gene_holdout.py:13)."""

    _DISPLAY_ATTRS = ("batch_size", "n_top")

    def __init__(self, n_top: int = 5, batch_size: int = 512,
                 random_state: Optional[int] = None, **kwargs):
        super().__init__(**kwargs)
        self.n_top = n_top
        self.batch_size = batch_size
        self.random_state = random_state

    def __call__(self, data):
        rng = np.random.default_rng(self.random_state)
        feat = np.asarray(data.get_feature(return_type="numpy"), dtype=np.float64)
        n_genes = feat.shape[1]
        targets = np.split(rng.permutation(n_genes),
                           range(self.batch_size, n_genes, self.batch_size))
        cov = np.cov(feat, rowvar=False)
        predictors = []
        for targs in targets:
            others = np.setdiff1d(np.arange(n_genes), targs)
            sub = cov[np.ix_(targs, others)]
            order = np.argsort(-sub, axis=1)[:, :self.n_top]
            predictors.append(np.unique(others[order.ravel()]))
        data.data.uns["targets"] = targets
        data.data.uns["predictors"] = predictors
        return data

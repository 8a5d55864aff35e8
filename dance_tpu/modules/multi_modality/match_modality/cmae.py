"""CMAE for modality matching (parity: dance/modules/multi_modality/
match_modality/cmae.py:257).

Reuses the cross-modal AE; matching scores come from aligned-latent similarity
put through the batch-separated bipartite matching evaluator
(dance/utils/metrics.py:95-135 parity).
"""

import numpy as np

from dance_tpu.modules.multi_modality.predict_modality.cmae import CMAE as _PredCMAE
from dance_tpu.modules.multi_modality.match_modality.base import MatchingScoreMixin
from dance_tpu.utils.metrics import batch_separated_bipartite_matching
from dance_tpu.utils.wrappers import as_numpy


class CMAE(MatchingScoreMixin, _PredCMAE):

    _DEFAULT_METRIC = "acc"

    def predict_matching(self, x1, x2, batch1=None, batch2=None,
                         threshold_quantile: float = 0.995) -> np.ndarray:
        """0/1 matching matrix between mod1 cells and mod2 cells."""
        emb1 = self.encode(x1, modality=1)
        emb2 = self.encode(x2, modality=2)
        if batch1 is None:
            batch1 = np.zeros(len(emb1), dtype=int)
            batch2 = np.zeros(len(emb2), dtype=int)
        return batch_separated_bipartite_matching(batch1, batch2, emb1, emb2,
                                                  threshold_quantile)


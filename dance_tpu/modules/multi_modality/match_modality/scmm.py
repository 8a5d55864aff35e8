"""scMM for modality matching (parity: dance/modules/multi_modality/
match_modality/scmm.py:362)."""

import numpy as np

from dance_tpu.modules.multi_modality.predict_modality.scmm import MMVAE as _PredMMVAE
from dance_tpu.modules.multi_modality.match_modality.base import MatchingScoreMixin
from dance_tpu.utils.metrics import batch_separated_bipartite_matching


class MMVAE(MatchingScoreMixin, _PredMMVAE):

    _DEFAULT_METRIC = "acc"

    def predict_matching(self, x1, x2, batch1=None, batch2=None,
                         threshold_quantile: float = 0.995) -> np.ndarray:
        emb1 = self.encode(x1, modality=1)
        emb2 = self.encode(x2, modality=2)
        if batch1 is None:
            batch1 = np.zeros(len(emb1), dtype=int)
            batch2 = np.zeros(len(emb2), dtype=int)
        return batch_separated_bipartite_matching(batch1, batch2, emb1, emb2,
                                                  threshold_quantile)

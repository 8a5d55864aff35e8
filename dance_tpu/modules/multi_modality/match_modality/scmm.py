"""scMM for modality matching (parity: dance/modules/multi_modality/
match_modality/scmm.py:362)."""

import numpy as np

from dance_tpu.modules.multi_modality.predict_modality.scmm import MMVAE as _PredMMVAE
from dance_tpu.modules.multi_modality.match_modality.base import (
    MatchingScoreMixin, nearest_neighbor_matching)


class MMVAE(MatchingScoreMixin, _PredMMVAE):

    _DEFAULT_METRIC = "acc"

    def predict_matching(self, x1, x2, metric: str = "l2") -> np.ndarray:
        """0/1 matching matrix: minkowski nearest neighbour over the mean
        latents (parity: match_modality/scmm.py:624-675)."""
        emb1 = self.encode(x1, modality=1)
        emb2 = self.encode(x2, modality=2)
        return nearest_neighbor_matching(emb1, emb2, metric=metric)

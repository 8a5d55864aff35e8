"""CMAE for modality matching (parity: dance/modules/multi_modality/
match_modality/cmae.py:257).

Reuses the cross-modal AE; matching scores come from aligned-latent similarity
put through the batch-separated bipartite matching evaluator
(dance/utils/metrics.py:95-135 parity).
"""

import numpy as np

from dance_tpu.modules.multi_modality.predict_modality.cmae import CMAE as _PredCMAE
from dance_tpu.modules.multi_modality.match_modality.base import (
    MatchingScoreMixin, nearest_neighbor_matching)


class CMAE(MatchingScoreMixin, _PredCMAE):

    _DEFAULT_METRIC = "acc"

    def predict_matching(self, x1, x2, metric: str = "l1") -> np.ndarray:
        """0/1 matching matrix: L1 nearest neighbour in the shared latent
        (parity: match_modality/cmae.py:308-331)."""
        emb1 = self.encode(x1, modality=1)
        emb2 = self.encode(x2, modality=2)
        return nearest_neighbor_matching(emb1, emb2, metric=metric)


"""scMoGNN for modality matching (parity: dance/modules/multi_modality/
match_modality/scmogcn.py:95).

Trains the bipartite GNN to map mod1 onto mod2 (and the reverse) and matches
cells by symmetric-softmax similarity of the aligned representations.
"""

import numpy as np

from dance_tpu.modules.multi_modality.predict_modality.scmogcn import (
    ScMoGCNWrapper as _PredScMoGCN)
from dance_tpu.modules.multi_modality.match_modality.base import MatchingScoreMixin
from dance_tpu.utils.metrics import batch_separated_bipartite_matching
from dance_tpu.utils.wrappers import as_numpy


class ScMoGCNWrapper(MatchingScoreMixin, _PredScMoGCN):

    _DEFAULT_METRIC = "acc"

    def predict_matching(self, x1, x2, batch1=None, batch2=None,
                         threshold_quantile: float = 0.995) -> np.ndarray:
        pred2 = self.predict(x1)  # mod1 cells projected into mod2 space
        emb2 = as_numpy(x2)
        if batch1 is None:
            batch1 = np.zeros(len(pred2), dtype=int)
            batch2 = np.zeros(len(emb2), dtype=int)
        return batch_separated_bipartite_matching(batch1, batch2, pred2, emb2,
                                                  threshold_quantile)

"""Shared scoring for modality-matching wrappers (parity: the `score` path of
dance/modules/multi_modality/match_modality/*, which all evaluate a 0/1
matching matrix against the known cell pairing)."""

import numpy as np


class MatchingScoreMixin:

    def score_matching(self, matching: np.ndarray, true_perm=None) -> float:
        """Fraction of cells matched to their true partner (identity by default)."""
        n = matching.shape[0]
        if true_perm is None:
            true_perm = np.arange(n)
        return float(matching[np.arange(n), true_perm].mean())

"""Shared scoring for modality-matching wrappers (parity: the `score` path of
dance/modules/multi_modality/match_modality/*, which all evaluate a 0/1
matching matrix against the known cell pairing)."""

import numpy as np


def nearest_neighbor_matching(emb1, emb2, metric: str = "l1",
                              chunk: int = 512) -> np.ndarray:
    """0/1 matching matrix: each mod2 cell pairs with its nearest mod1 cell.

    The reference CMAE matches by L1 nearest neighbours in the shared latent
    (match_modality/cmae.py:308-331) and scMM by minkowski/L2 nearest
    neighbours (match_modality/scmm.py:624-675) — NOT by the dot-product
    bipartite evaluator (that one belongs to scMoGNN, whose embeddings are
    trained with a dot-product CLIP loss). Distances run on device in chunks
    so no (n2, n1, d) intermediate materializes.
    """
    import jax.numpy as jnp

    e1 = jnp.asarray(np.asarray(emb1), jnp.float32)
    e2 = jnp.asarray(np.asarray(emb2), jnp.float32)
    n1, n2 = e1.shape[0], e2.shape[0]
    nn_idx = np.empty(n2, np.int64)
    for lo in range(0, n2, chunk):
        block = e2[lo:lo + chunk]
        if metric == "l1":
            d = jnp.abs(block[:, None, :] - e1[None, :, :]).sum(-1)
        else:  # l2 / minkowski(p=2): argmin of expanded square, no sqrt needed
            d = ((block ** 2).sum(1)[:, None] - 2.0 * block @ e1.T
                 + (e1 ** 2).sum(1)[None, :])
        nn_idx[lo:lo + chunk] = np.asarray(jnp.argmin(d, axis=1))
    matching = np.zeros((n2, n1), np.float32)
    matching[np.arange(n2), nn_idx] = 1.0
    return matching


class MatchingScoreMixin:

    def score_matching(self, matching: np.ndarray, true_perm=None) -> float:
        """Fraction of cells matched to their true partner (identity by default)."""
        n = matching.shape[0]
        if true_perm is None:
            true_perm = np.arange(n)
        return float(matching[np.arange(n), true_perm].mean())

"""Registry-backed scoring functions (parity: dance/utils/metrics.py:16-190).

Metrics run host-side on numpy (inputs may arrive as jax/torch arrays and are
cast down). The bipartite-matching evaluation replaces the reference's
networkx matching with ``scipy.optimize.linear_sum_assignment`` — identical
optimum, much faster.
"""

import numpy as np
import scipy.optimize
from sklearn.cluster import KMeans
from sklearn.metrics import (adjusted_rand_score, mean_absolute_percentage_error,
                             mean_squared_error, normalized_mutual_info_score,
                             silhouette_score)

from dance_tpu.registry import REGISTERED_METRIC_FUNCS, register_metric_func
from dance_tpu.settings import logger
from dance_tpu.typing import Any, Mapping, Optional, Union
from dance_tpu.utils.wrappers import torch_to_numpy


def resolve_score_func(score_func: Optional[Union[str, Mapping[Any, float]]]):
    """Resolve a metric by registry name or pass a callable through."""
    if score_func is None:
        raise ValueError("Scoring function not specified")
    if isinstance(score_func, str):
        if score_func not in REGISTERED_METRIC_FUNCS:
            raise KeyError(f"Unknown scoring function {score_func!r}; "
                           f"options: {sorted(REGISTERED_METRIC_FUNCS)}")
        return REGISTERED_METRIC_FUNCS[score_func]
    return score_func


@register_metric_func()
@torch_to_numpy
def acc(true, pred) -> float:
    """Accuracy, multi-positive aware (parity: metrics.py:33).

    ``true`` is either a (n, k) one/multi-hot matrix — a prediction counts as
    correct when it hits any positive — or a (n,) integer label vector.
    """
    true, pred = np.asarray(true), np.asarray(pred).ravel()
    if true.ndim == 2:
        # out-of-range predictions (e.g. SingleCellNet's extra "unknown" class)
        # count as incorrect instead of crashing the indexing
        valid = pred < true.shape[1]
        hits = np.zeros(pred.shape[0], dtype=float)
        hits[valid] = true[np.nonzero(valid)[0], pred[valid]]
        return float(hits.mean())
    return float((true.ravel() == pred).mean())


@register_metric_func()
@torch_to_numpy
def ari(true, pred) -> float:
    return float(adjusted_rand_score(np.asarray(true).ravel(), np.asarray(pred).ravel()))


def device_ari(true, pred, n_true: int, n_pred: int):
    """Adjusted Rand index as a jittable device computation.

    Contingency table via one one-hot MXU matmul, then the pair-counting
    formula. Used by the DEC-family training loops for per-epoch best-ARI
    snapshot selection WITHOUT pulling the full soft-assignment matrix to the
    host every epoch (the sklearn round trip costs more than the training
    dispatch over the axon relay). Final reported scores still go through
    sklearn's ``adjusted_rand_score``; at n=10k the f32 pair counts agree to
    ~1e-6.
    """
    import jax
    import jax.numpy as jnp

    t = jax.nn.one_hot(jnp.asarray(true, jnp.int32), n_true, dtype=jnp.float32)
    p = jax.nn.one_hot(jnp.asarray(pred, jnp.int32), n_pred, dtype=jnp.float32)
    cont = p.T @ t  # (n_pred, n_true)

    def comb2(x):
        return x * (x - 1.0) * 0.5

    sum_ij = comb2(cont).sum()
    a = comb2(cont.sum(1)).sum()
    b = comb2(cont.sum(0)).sum()
    total = comb2(jnp.asarray(t.shape[0], jnp.float32))
    expected = a * b / jnp.maximum(total, 1.0)
    max_index = 0.5 * (a + b)
    denom = max_index - expected
    return jnp.where(denom == 0, 1.0, (sum_ij - expected) / denom)


@register_metric_func()
@torch_to_numpy
def nmi(true, pred) -> float:
    return float(normalized_mutual_info_score(np.asarray(true).ravel(),
                                              np.asarray(pred).ravel(), average_method="max"))


@register_metric_func()
@torch_to_numpy
def mse(true, pred) -> float:
    return float(mean_squared_error(np.asarray(true), np.asarray(pred)))


@register_metric_func()
@torch_to_numpy
def rmse(true, pred) -> float:
    return float(np.sqrt(mean_squared_error(np.asarray(true), np.asarray(pred))))


@register_metric_func()
@torch_to_numpy
def mape(true, pred) -> float:
    return float(mean_absolute_percentage_error(np.asarray(true), np.asarray(pred)))


def get_bipartite_matching_adjacency_matrix(raw_logits, threshold_quantile: float = 0.995):
    """Sparse-then-assign bipartite matching for modality matching eval.

    Parity: dance/utils/metrics.py:95 (mk3). Entries below both their row and
    column ``threshold_quantile`` are zeroed, then a minimum-weight full
    matching on the negated scores yields a permutation-like 0/1 matrix.
    """
    weights = np.array(raw_logits, dtype=np.float64, copy=True)
    q_row = np.quantile(weights, threshold_quantile, axis=0, keepdims=True)
    q_col = np.quantile(weights, threshold_quantile, axis=1, keepdims=True)
    weights[(weights < q_row) & (weights < q_col)] = 0
    row_ind, col_ind = scipy.optimize.linear_sum_assignment(-weights)
    out = np.zeros_like(weights)
    out[row_ind, col_ind] = 1
    return out


def get_bipartite_matching_adjacency_matrix_mk3(raw_logits,
                                                 threshold_quantile=0.995,
                                                 copy=False):
    """Reference-named entry point (parity: dance/utils/metrics.py:95)."""
    logits = raw_logits.copy() if copy else raw_logits
    return get_bipartite_matching_adjacency_matrix(
        logits, threshold_quantile=threshold_quantile)


def batch_separated_bipartite_matching(batch1, batch2, emb1, emb2, threshold_quantile=0.995):
    """Per-batch bipartite matching between two modality embeddings.

    Parity: dance/utils/metrics.py:118. Softmax-symmetrized dot-product logits
    per shared batch label, matched independently within each batch.
    """
    from dance_tpu.utils.wrappers import as_numpy

    batch1, batch2 = np.asarray(batch1), np.asarray(batch2)
    emb1, emb2 = as_numpy(emb1), as_numpy(emb2)
    matrix = np.zeros((batch1.shape[0], batch2.shape[0]))
    for b in np.unique(batch1):
        i0 = np.nonzero(batch1 == b)[0]
        j0 = np.nonzero(batch2 == b)[0]
        logits = emb1[i0] @ emb2[j0].T
        logits = _softmax(logits, axis=-1) + _softmax(logits, axis=0)
        matrix[np.ix_(i0, j0)] = get_bipartite_matching_adjacency_matrix(
            logits, threshold_quantile=threshold_quantile)
    return matrix


def _softmax(x, axis):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def labeled_clustering_evaluate(emb, true_labels, n_clusters: int = 10, random_state: int = 200):
    """KMeans over an embedding scored by NMI/ARI against known labels.

    Parity: dance/utils/metrics.py:138 (takes arrays instead of AnnData).
    """
    emb = np.asarray(emb)
    true_labels = np.asarray(true_labels).ravel()
    pred = KMeans(n_clusters=n_clusters, n_init=5, random_state=random_state).fit_predict(emb)
    scores = {"dance_nmi": round(float(normalized_mutual_info_score(
        true_labels, pred, average_method="max")), 3),
              "dance_ari": round(float(adjusted_rand_score(true_labels, pred)), 3)}
    logger.info("NMI: %s ARI: %s", scores["dance_nmi"], scores["dance_ari"])
    return scores


def integration_openproblems_evaluate(emb, cell_type, batch=None, **kwargs):
    """Joint-embedding quality suite (parity: dance/utils/metrics.py:151).

    Delegates to the first-party scIB reimplementation in
    :mod:`dance_tpu.utils.scib_metrics`: label/batch silhouettes, optimized-
    Louvain NMI, graph connectivity, and (when inputs are supplied) cell-cycle
    and trajectory conservation — averaged into ``final_scores`` the same way
    as the reference. Extra inputs pass through as keyword arguments
    (``emb_pre``, ``s_score``, ``g2m_score``, ``pseudotime``).
    """
    from dance_tpu.utils.scib_metrics import integration_openproblems_suite
    return integration_openproblems_suite(emb, cell_type, batch, **kwargs)


def ood_measures(ind_scores, ood_scores):
    """OOD detection measures (parity: scheteronet.py:760 get_measures).

    ``ind_scores``/``ood_scores`` are detector scores where in-distribution
    nodes score HIGHER (e.g. negative energy). Returns (auroc, aupr, fpr@95):
    AUROC/AUPR of separating ind from ood, and the false-positive rate on ood
    at the threshold that keeps 95% recall on ind.
    """
    from sklearn.metrics import average_precision_score, roc_auc_score
    ind = np.asarray(ind_scores, dtype=np.float64).ravel()
    ood = np.asarray(ood_scores, dtype=np.float64).ravel()
    if len(ind) == 0 or len(ood) == 0:
        raise ValueError("ood_measures needs non-empty ind and ood score sets "
                         f"(got {len(ind)} ind, {len(ood)} ood)")
    scores = np.concatenate([ind, ood])
    labels = np.concatenate([np.ones_like(ind), np.zeros_like(ood)])
    auroc = float(roc_auc_score(labels, scores))
    aupr = float(average_precision_score(labels, scores))
    thresh = np.percentile(ind, 5)  # keep 95% of ind above threshold
    fpr95 = float((ood >= thresh).mean())
    return auroc, aupr, fpr95

"""Device-native random forest (vmapped random-threshold trees).

TPU-first replacement for the sklearn ``RandomForestClassifier`` the
reference keeps on the host (reference dance/modules/single_modality/
cell_type_annotation/singlecellnet.py:10): every tree of the ensemble
grows in lockstep under one ``jax.vmap``, one depth level per step of a
single ``lax.scan``, so the whole forest fit is one dispatch and one
compiled level body (node tables are padded to the deepest level's width
so every scan step has identical shapes).

The split search is the extremely-randomized-trees variant mapped onto
TPU-friendly dense ops: at each level every node scores K random
(feature, threshold) candidates by weighted Gini and keeps the best.
Class-count histograms for all (node, candidate, side, class) cells are
built with one ``segment_sum`` over the fused ``node * n_classes + y``
index — no per-node Python, no data-dependent shapes. Trees are grown to
a fixed ``max_depth`` (complete binary tree layout: node v's children are
2v / 2v+1), with Poisson(1) bootstrap weights and Laplace-smoothed leaf
distributions. sklearn remains only as the parity oracle in tests
(SURVEY §2.8).
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class Forest(NamedTuple):
    """Fitted forest split tables + leaf class distributions.

    ``feats``/``thrs``: (n_trees, max_depth, 2**(max_depth-1)) chosen
    feature / threshold per node per level (level l uses the first 2**l
    slots). ``leaf_probs``: (n_trees, 2**max_depth, n_classes).
    """
    feats: jax.Array
    thrs: jax.Array
    leaf_probs: jax.Array


def _grow_level(x, y_seg, w, node, cand_f, cand_t, n_nodes: int, n_classes: int):
    """One lockstep level for a single tree.

    node: (n,) current node id (always < n_nodes, the padded width).
    cand_f/cand_t: (n_nodes, K). Returns (chosen_feat, chosen_thr, new_node).
    """
    k = cand_f.shape[1]
    # candidate split decisions for every example against ITS node's slate
    f_e = cand_f[node]                                   # (n, K)
    t_e = cand_t[node]                                   # (n, K)
    vals = jnp.take_along_axis(x, f_e, axis=1)           # (n, K)
    left = (vals <= t_e).astype(x.dtype)                 # (n, K)

    seg = node * n_classes + y_seg                       # (n,)
    n_seg = n_nodes * n_classes
    cl = jax.ops.segment_sum(w[:, None] * left, seg, num_segments=n_seg)
    cl = cl.reshape(n_nodes, n_classes, k)               # left counts
    tot = jax.ops.segment_sum(w, seg, num_segments=n_seg)
    tot = tot.reshape(n_nodes, n_classes)                # node class counts
    cr = tot[:, :, None] - cl                            # right counts

    nl = cl.sum(1)                                       # (n_nodes, K)
    nr = cr.sum(1)
    # maximize sum_c cl^2/nl + cr^2/nr  (equivalent to weighted-Gini gain)
    score = ((cl ** 2).sum(1) / jnp.maximum(nl, 1e-9)
             + (cr ** 2).sum(1) / jnp.maximum(nr, 1e-9))
    score = jnp.where((nl > 0) & (nr > 0), score, -jnp.inf)

    best = jnp.argmax(score, axis=1)                     # (n_nodes,)
    chosen_f = jnp.take_along_axis(cand_f, best[:, None], axis=1)[:, 0]
    chosen_t = jnp.take_along_axis(cand_t, best[:, None], axis=1)[:, 0]

    go_left = x[jnp.arange(x.shape[0]), chosen_f[node]] <= chosen_t[node]
    new_node = node * 2 + (1 - go_left.astype(node.dtype))
    return chosen_f, chosen_t, new_node


@partial(jax.jit, static_argnames=("n_trees", "max_depth", "n_candidates",
                                   "n_classes", "bootstrap"))
def _fit_forest(x, y, base_w, seed, n_trees: int, max_depth: int,
                n_candidates: int, n_classes: int, bootstrap: bool = True):
    n, n_feats = x.shape
    width = 2 ** (max_depth - 1)                         # deepest level width
    key = jax.random.key(seed)
    k_boot, k_lvl = jax.random.split(key)

    if bootstrap:
        w = base_w * jax.random.poisson(
            k_boot, 1.0, (n_trees, n)).astype(x.dtype)
    else:
        w = jnp.broadcast_to(base_w, (n_trees, n))

    def one_tree(w_t, key_t):
        node0 = jnp.zeros((n,), jnp.int32)

        def level(node, key_l):
            kf, kt1, kt2 = jax.random.split(key_l, 3)
            cand_f = jax.random.randint(kf, (width, n_candidates), 0, n_feats)
            # random thresholds: midpoint of two random examples' values at
            # the candidate feature (extra-trees style, data-distributed)
            r1 = jax.random.randint(kt1, (width, n_candidates), 0, n)
            r2 = jax.random.randint(kt2, (width, n_candidates), 0, n)
            cand_t = (x[r1, cand_f] + x[r2, cand_f]) * 0.5
            # node ids at level l stay < 2**l <= width: the padded tail of
            # the tables is never indexed, so uniform shapes are safe
            f, t, node = _grow_level(x, y, w_t, node, cand_f, cand_t,
                                     width, n_classes)
            return node, (f, t)

        node, (feats, thrs) = jax.lax.scan(
            level, node0, jax.random.split(key_t, max_depth))
        n_leaves = 2 ** max_depth
        counts = jax.ops.segment_sum(
            w_t, node * n_classes + y,
            num_segments=n_leaves * n_classes).reshape(n_leaves, n_classes)
        return feats, thrs, counts

    feats, thrs, counts = jax.vmap(one_tree)(
        w, jax.random.split(k_lvl, n_trees))

    # Laplace smoothing toward the global class prior: empty leaves fall
    # back to the prior instead of NaN.
    prior = jax.ops.segment_sum(base_w, y, num_segments=n_classes)
    prior = prior / jnp.maximum(prior.sum(), 1e-9)
    leaf_probs = ((counts + prior[None, None, :])
                  / jnp.maximum(counts.sum(-1, keepdims=True) + 1.0, 1e-9))
    return Forest(feats, thrs, leaf_probs)


@jax.jit
def _predict_proba(forest: Forest, x):
    n = x.shape[0]
    rows = jnp.arange(n)

    def one_tree(feats, thrs, leaf_probs):
        def level(node, ft):
            f_l, t_l = ft
            go_left = x[rows, f_l[node]] <= t_l[node]
            return node * 2 + (1 - go_left.astype(node.dtype)), None

        node, _ = jax.lax.scan(level, jnp.zeros((n,), jnp.int32),
                               (feats, thrs))
        return leaf_probs[node]                          # (n, C)

    probs = jax.vmap(one_tree)(forest.feats, forest.thrs, forest.leaf_probs)
    return probs.mean(0)


class RandomForest:
    """sklearn-shaped facade over the jitted forest fit/predict.

    ``class_weight="balanced"`` mirrors sklearn: base example weight
    ``n / (n_classes * bincount(y))`` before the bootstrap draw.
    """

    def __init__(self, n_estimators: int = 100, max_depth: int = 10,
                 n_candidates: int = 32, class_weight=None,
                 bootstrap: bool = True, random_state: int = 0):
        self.n_estimators = n_estimators
        self.max_depth = max_depth
        self.n_candidates = n_candidates
        self.class_weight = class_weight
        self.bootstrap = bootstrap
        self.random_state = random_state
        self.forest = None

    def fit(self, x, y):
        x = jnp.asarray(np.asarray(x), jnp.float32)
        y_np = np.asarray(y).astype(np.int32)
        self.classes_ = np.unique(y_np)
        n_classes = int(self.classes_.max()) + 1
        if self.class_weight == "balanced":
            counts = np.bincount(y_np, minlength=n_classes).astype(np.float32)
            base_w = (len(y_np) / (len(self.classes_)
                                   * np.maximum(counts, 1.0)))[y_np]
        else:
            base_w = np.ones(len(y_np), np.float32)
        self.forest = _fit_forest(
            x, jnp.asarray(y_np), jnp.asarray(base_w),
            self.random_state or 0, self.n_estimators, self.max_depth,
            self.n_candidates, n_classes, self.bootstrap)
        self._n_classes = n_classes
        return self

    def predict_proba(self, x):
        x = jnp.asarray(np.asarray(x), jnp.float32)
        return np.asarray(_predict_proba(self.forest, x))

    def predict(self, x):
        return self.predict_proba(x).argmax(1)


__all__ = ["Forest", "RandomForest"]

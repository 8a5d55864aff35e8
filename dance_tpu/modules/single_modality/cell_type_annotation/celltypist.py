"""Celltypist cell-type annotation (parity: dance/modules/.../celltypist.py).

Logistic regression (optionally SGD / mini-batch / two-pass feature selection)
over scaled expression, with optional majority-vote refinement over an
over-clustering of the query (the reference uses scanpy leiden; here the
first-party kNN + Leiden from :mod:`dance_tpu.ops.cluster`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
from sklearn.linear_model import LogisticRegression, SGDClassifier
from sklearn.preprocessing import StandardScaler

from dance_tpu.modules.base import BaseClassificationMethod
from dance_tpu.settings import logger
from dance_tpu.transforms import SetConfig
from dance_tpu.typing import LogLevel, Optional, Union
from dance_tpu.utils.wrappers import as_numpy


class Model:
    """Trained classifier bundle (parity: celltypist.py:18)."""

    def __init__(self, clf, scaler, description):
        self.classifier = clf
        self.scaler = scaler
        self.description = description

    @property
    def cell_types(self) -> np.ndarray:
        return self.classifier.classes_

    @property
    def features(self) -> np.ndarray:
        return self.classifier.features

    def __repr__(self):
        return (f"CellTypist model with {len(self.cell_types)} cell types and "
                f"{len(self.features)} features")

    def predict_labels_and_prob(self, indata):
        indata = self.scaler.transform(indata)
        indata = np.clip(indata, None, 10)
        decision_mat = self.classifier.decision_function(indata)
        if decision_mat.ndim == 1:
            decision_mat = np.column_stack([-decision_mat, decision_mat])
        prob_mat = 1 / (1 + np.exp(-decision_mat))
        labels = self.cell_types[prob_mat.argmax(1)]
        return labels, prob_mat, decision_mat

    def extract_top_markers(self, cell_type, top_n: int = 10,
                            only_positive: bool = True) -> np.ndarray:
        idx = list(self.cell_types).index(cell_type)
        coef = (self.classifier.coef_[idx] if self.classifier.coef_.ndim == 2
                else self.classifier.coef_)
        order = np.argsort(-coef if only_positive else -np.abs(coef))
        return np.asarray(self.features)[order[:top_n]]


class AnnotationResult:
    """Prediction bundle (parity: celltypist.py:124)."""

    def __init__(self, labels: pd.DataFrame, decision_mat: pd.DataFrame,
                 prob_mat: pd.DataFrame):
        self.predicted_labels = labels
        self.decision_matrix = decision_mat
        self.probability_matrix = prob_mat

    def summary_frequency(self, by: str = "predicted_labels") -> pd.DataFrame:
        counts = self.predicted_labels[by].value_counts()
        return pd.DataFrame({by: counts.index, "counts": counts.values})

    def __repr__(self):
        return (f"AnnotationResult for {len(self.predicted_labels)} query cells")


class Classifier:
    """Query-side wrapper (parity: celltypist.py:348)."""

    def __init__(self, x: np.ndarray, model: Model):
        self.indata = np.asarray(x)
        self.model = model

    def celltype(self) -> AnnotationResult:
        labels, prob, decision = self.model.predict_labels_and_prob(self.indata)
        cells = pd.RangeIndex(len(labels))
        cols = list(self.model.cell_types)
        return AnnotationResult(
            pd.DataFrame({"predicted_labels": labels}, index=cells),
            pd.DataFrame(decision, columns=cols, index=cells),
            pd.DataFrame(prob, columns=cols, index=cells))

    def over_cluster(self, resolution: Optional[float] = None) -> pd.Series:
        """Leiden over-clustering of the query (parity: celltypist.py:450)."""
        from dance_tpu.ops.cluster import leiden
        from dance_tpu.ops.linalg import pca
        from dance_tpu.ops.neighbors import knn_graph
        n = self.indata.shape[0]
        if resolution is None:
            resolution = (5 if n < 5000 else 10 if n < 20000 else 15 if n < 40000
                          else 20 if n < 100000 else 25)
        emb = np.asarray(pca(self.indata.astype(np.float32),
                             min(50, min(self.indata.shape) - 1)).embedding)
        adj = knn_graph(emb, min(15, n - 1), mode="connectivity", include_self=False)
        labels = leiden(adj, resolution=resolution)
        return pd.Series(labels.astype(str))


@jax.jit
def _device_standardize(xj):
    """sklearn StandardScaler + clip(·, max=10) as ONE jitted program
    (celltypist's to_array + scale step, reference celltypist.py:680) —
    eager jnp ops would cost one relay dispatch each."""
    mean = xj.mean(0)
    scale = jnp.sqrt(xj.var(0))
    scale = jnp.where(scale == 0, 1.0, scale)
    return jnp.clip((xj - mean) / scale, None, 10), mean, scale


class Celltypist(BaseClassificationMethod):
    """Celltypist method wrapper (parity: celltypist.py:535)."""

    def __init__(self, majority_voting: bool = False, clf=None, scaler=None,
                 description=None):
        self.majority_voting = majority_voting
        self.classifier = clf
        self.scaler = scaler
        self.description = description

    @staticmethod
    def preprocessing_pipeline(log_level: LogLevel = "INFO"):
        return SetConfig({"label_channel": "cell_type"}, log_level=log_level)

    def fit(self, indata, labels=None, C: float = 1.0, solver: Optional[str] = None,
            max_iter: int = 1000, n_jobs: Optional[int] = None, use_SGD: bool = False,
            alpha: float = 0.0001, mini_batch: bool = False, batch_number: int = 100,
            batch_size: int = 1000, epochs: int = 10, balance_cell_type: bool = False,
            feature_selection: bool = False, top_genes: int = 300,
            backend: str = "device", **kwargs):
        # as_device passthrough (BENCH_NOTES round-4 methodology): a
        # pre-uploaded device matrix skips both the host download and the
        # ~80 MB re-upload over the relay
        if not isinstance(indata, jax.Array):
            indata = as_numpy(indata)
        labels = as_numpy(labels)
        if labels.ndim == 2:
            labels = labels.argmax(1)
        genes = np.arange(indata.shape[1]).astype(str)

        scaler = StandardScaler()
        if backend == "device":
            # standardize on device: one jitted pass instead of sklearn's
            # multi-pass host transform (~0.4 s of the 0.8 s host fit at
            # 10k×2k); the scaler object keeps the sklearn surface (mean_/
            # scale_ for predict + feature-selection slicing)
            xj = jnp.asarray(indata, jnp.float32)
            # one jitted program (eager jnp ops are one relay dispatch EACH)
            indata_s, mean, scale = _device_standardize(xj)
            # ONE batched download (a fresh small np.asarray costs a full
            # relay round trip ~0.5 s each over the axon tunnel)
            scaler.mean_, scaler.scale_ = jax.device_get((mean, scale))
            scaler.var_ = scaler.scale_ ** 2
            scaler.n_features_in_ = indata.shape[1]
            scaler.n_samples_seen_ = indata.shape[0]
        else:
            indata_s = np.clip(scaler.fit_transform(indata), None, 10)

        def train(x, y):
            if backend == "device":
                # TPU-native heads (SURVEY §2.8): one jitted scan per fit
                from dance_tpu.ops.linear_model import (
                    DeviceLogisticRegression, DeviceSGDLogistic)
                if use_SGD or feature_selection:
                    steps = (epochs * min(batch_number,
                                          max(len(y) // batch_size, 1))
                             if mini_batch else max_iter)
                    return DeviceSGDLogistic(
                        alpha=alpha, epochs=steps,
                        batch_size=batch_size if mini_batch else 0).fit(x, y)
                return DeviceLogisticRegression(C=C, epochs=max_iter).fit(x, y)
            if use_SGD or feature_selection:
                return _sgd_classifier(x, y, alpha=alpha, max_iter=max_iter,
                                       n_jobs=n_jobs, mini_batch=mini_batch,
                                       batch_number=batch_number, batch_size=batch_size,
                                       epochs=epochs,
                                       balance_cell_type=balance_cell_type, **kwargs)
            # sklearn >= 1.7 dropped multi_class="ovr"; OvR probability shape is
            # recovered in predict via the sigmoid over decision_function
            return LogisticRegression(C=C, solver=solver or "lbfgs", max_iter=max_iter,
                                      n_jobs=n_jobs, **kwargs).fit(x, y)

        classifier = train(indata_s, labels)

        if feature_selection:
            if len(genes) <= top_genes:
                raise ValueError(f"Only {len(genes)} genes; cannot select {top_genes}")
            gene_index = np.unique(np.argpartition(np.abs(classifier.coef_), -top_genes,
                                                   axis=1)[:, -top_genes:])
            logger.info("%d features selected", len(gene_index))
            genes = genes[gene_index]
            classifier = train(indata_s[:, gene_index], labels)
            scaler.mean_ = scaler.mean_[gene_index]
            scaler.var_ = scaler.var_[gene_index]
            scaler.scale_ = scaler.scale_[gene_index]
            scaler.n_features_in_ = len(gene_index)

        classifier.features = genes
        self.classifier = classifier
        self.scaler = scaler
        self.description = {"number_celltypes": len(classifier.classes_)}
        return self

    def predict(self, x, as_obj: bool = False, over_clustering=None,
                min_prop: float = 0.0):
        x = as_numpy(x)
        model = Model(self.classifier, self.scaler, self.description)
        clf = Classifier(x, model)
        predictions = clf.celltype()
        if self.majority_voting:
            if over_clustering is None:
                over_clustering = clf.over_cluster()
            predictions = self._majority_voting(predictions, over_clustering, min_prop)
        if as_obj:
            return predictions
        col = ("majority_voting" if "majority_voting" in predictions.predicted_labels
               else "predicted_labels")
        return predictions.predicted_labels[col].to_numpy()

    @staticmethod
    def _majority_voting(predictions: AnnotationResult, over_clustering,
                         min_prop: float = 0.0) -> AnnotationResult:
        """Assign each over-cluster its dominant predicted label (parity: :492)."""
        over_clustering = pd.Series(np.asarray(over_clustering),
                                    index=predictions.predicted_labels.index)
        votes = pd.crosstab(predictions.predicted_labels["predicted_labels"],
                            over_clustering)
        majority = votes.idxmax(axis=0)
        freqs = votes.max(axis=0) / votes.sum(axis=0)
        majority[freqs < min_prop] = "Heterogeneous"
        mapped = over_clustering.map(majority)
        predictions.predicted_labels["over_clustering"] = over_clustering
        predictions.predicted_labels["majority_voting"] = mapped
        return predictions


def _sgd_classifier(indata, labels, alpha, max_iter, n_jobs, mini_batch, batch_number,
                    batch_size, epochs, balance_cell_type, **kwargs) -> SGDClassifier:
    """SGD logistic classifier, optionally mini-batch (parity: celltypist.py:777)."""
    clf = SGDClassifier(loss="log_loss", alpha=alpha, max_iter=max_iter, n_jobs=n_jobs,
                        **kwargs)
    if not mini_batch:
        return clf.fit(indata, labels)
    classes = np.unique(labels)
    rng = np.random.default_rng(0)
    n = indata.shape[0]
    p = None
    if balance_cell_type:
        counts = pd.Series(labels).value_counts()
        p = (1 / counts[labels].to_numpy())
        p = p / p.sum()
    for _ in range(epochs):
        for _ in range(min(batch_number, max(n // batch_size, 1))):
            idx = rng.choice(n, size=min(batch_size, n), replace=False if p is None
                             else True, p=p)
            clf.partial_fit(indata[idx], labels[idx], classes=classes)
    return clf


def LRClassifier_celltypist(indata, labels, C, solver, max_iter, n_jobs,
                            **kwargs) -> LogisticRegression:
    """Train the celltypist logistic classifier (parity: celltypist.py:755):
    solver auto-selects sag past 50k cells, one-vs-rest multi-class."""
    no_cells = len(labels)
    if solver is None:
        solver = "sag" if no_cells > 50000 else "lbfgs"
    elif solver not in ("liblinear", "lbfgs", "newton-cg", "sag", "saga"):
        raise ValueError("Invalid `solver`, should be one of 'liblinear', "
                         "'lbfgs', 'newton-cg', 'sag', and 'saga'")
    logger.info("LRClassifier training start...")
    clf = LogisticRegression(C=C, solver=solver, max_iter=max_iter,
                             n_jobs=n_jobs, **kwargs)
    clf.fit(indata, labels)
    return clf


def SGDClassifier_celltypist(indata, labels, alpha, max_iter, n_jobs,
                             mini_batch, batch_number, batch_size, epochs,
                             balance_cell_type, **kwargs) -> SGDClassifier:
    """Train the celltypist SGD classifier (parity: celltypist.py:777);
    delegates to the framework's mini-batch implementation."""
    return _sgd_classifier(indata, np.asarray(labels), alpha, max_iter, n_jobs,
                           mini_batch, batch_number, batch_size, epochs,
                           balance_cell_type, **kwargs)

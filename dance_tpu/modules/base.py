"""Method base contract (parity: dance/modules/base.py).

``BaseMethod.fit/predict/score`` with registry-resolved metrics, the pretrain
orchestration mixin, and task bases fixing default metrics. The torch
state-dict pretrain checkpointing becomes pickled JAX pytrees; module freezing
becomes parameter-subtree masking applied by the optimizer
(:meth:`NNPretrain.frozen_mask`).
"""

import os
import pickle
from abc import ABC, abstractmethod
from contextlib import contextmanager
from time import time

from dance_tpu.settings import logger
from dance_tpu.typing import Any, Mapping, Optional, Tuple, Union
from dance_tpu.utils.metrics import resolve_score_func


class BaseMethod(ABC):

    _DEFAULT_METRIC: Optional[str] = None
    _DISPLAY_ATTRS: Tuple[str, ...] = ()

    @property
    def name(self) -> str:
        return self.__class__.__name__

    def __repr__(self) -> str:
        attrs = ", ".join(f"{i}={getattr(self, i)!r}" for i in self._DISPLAY_ATTRS)
        return f"{self.name}({attrs})"

    def preprocess(self, data, /, **kwargs):
        self.preprocessing_pipeline(**kwargs)(data)

    @staticmethod
    @abstractmethod
    def preprocessing_pipeline(**kwargs):
        ...

    @abstractmethod
    def fit(self, x, y=None, **kwargs):
        ...

    def fit_distributed(self, *args, mesh=None, **kwargs):
        """Data-parallel fit over a device mesh (shared scale-out path).

        Runs the model's standard ``fit`` inside
        :func:`dance_tpu.parallel.mesh.dp_context`: every input array the
        model moves to device through ``to_device`` gets its cells axis
        sharded over the mesh's ``dp`` axis, parameters stay replicated, and
        XLA's GSPMD partitioner inserts the gradient all-reduce. Identical
        math to ``fit`` (modulo ≤dp-1 wrap-padded rows when the cell count is
        not divisible by the dp size). Host-side (sklearn-backed) methods
        simply run unsharded.

        Models with a ``use_bsr`` knob default to the CSR segment path here
        (unless the caller forces it): the Pallas block-sparse kernels are
        single-device programs. Graph models with the partitioned-sparse path
        (scDeepSort, graph-sc) go further and shard the adjacency itself —
        block rows split over dp as a
        :class:`~dance_tpu.parallel.sharded_graph.ShardedCSR`, so per-device
        edge storage is ~1/D and each conv is one ``shard_map`` SpMM.
        """
        import inspect

        from dance_tpu.parallel.mesh import current_mesh, dp_context
        if "use_bsr" in inspect.signature(self.fit).parameters:
            kwargs.setdefault("use_bsr", False)
        mesh = mesh or current_mesh()
        with dp_context(mesh):
            return self.fit(*args, **kwargs)

    def predict_proba(self, x):
        raise NotImplementedError

    @abstractmethod
    def predict(self, x):
        ...

    @property
    def default_score_func(self) -> Mapping[Any, float]:
        return resolve_score_func(self._DEFAULT_METRIC)

    def score(self, x, y, *, score_func: Optional[Union[str, Mapping]] = None,
              return_pred: bool = False):
        y_pred = self.predict(x)
        func = resolve_score_func(score_func or self._DEFAULT_METRIC)
        score = func(y, y_pred)
        return (score, y_pred) if return_pred else score

    def fit_predict(self, x, y=None, **fit_kwargs):
        self.fit(x, y, **fit_kwargs)
        return self.predict(x)

    def fit_score(self, x, y, *, score_func=None, return_pred: bool = False,
                  **fit_kwargs):
        """Fit on x (unsupervised) then score against y."""
        self.fit(x, **fit_kwargs)
        return self.score(x, y, score_func=score_func, return_pred=return_pred)


class BasePretrain(ABC):
    """Pretrain orchestration: load from ``pretrain_path`` if present, else
    pretrain and save (parity: modules/base.py:74-117)."""

    @property
    def is_pretrained(self) -> bool:
        return getattr(self, "_is_pretrained", False)

    def _pretrain(self, *args, force_pretrain: bool = False, **kwargs):
        pt_path = getattr(self, "pretrain_path", None)
        if not force_pretrain:
            if self.is_pretrained:
                logger.info("Skipping pretrain (already pretrained); "
                            "set force_pretrain=True to redo")
                return
            if pt_path is not None and os.path.isfile(pt_path):
                logger.info("Loading pre-trained model from %s", pt_path)
                self.load_pretrained(pt_path)
                self._is_pretrained = True
                return
        if pt_path is None:
            logger.warning("pretrain_path not set; pre-trained model will not be saved")
        t = time()
        self.pretrain(*args, **kwargs)
        logger.info("Pre-training finished (took %.2f seconds)", time() - t)
        self._is_pretrained = True
        if pt_path is not None:
            self.save_pretrained(pt_path)

    def pretrain(self, *args, **kwargs):
        ...

    def save_pretrained(self, path, **kwargs):
        ...

    def load_pretrained(self, path, **kwargs):
        ...


class NNPretrain(BasePretrain, ABC):
    """JAX counterpart of TorchNNPretrain (modules/base.py:120-153).

    Models keep their parameters in ``self.params`` (a pytree). Freezing is
    expressed as a set of top-level parameter-collection names; optimizers
    consult :meth:`frozen_mask` (an optax-compatible pytree mask) so frozen
    subtrees receive zero updates.
    """

    def __init__(self):
        self._frozen: set = set()

    def fix_module(self, *names: str):
        self._frozen.update(names)

    def unfix_module(self, *names: str):
        self._frozen.difference_update(names)

    # reference plural aliases
    fix_modules = fix_module
    unfix_modules = unfix_module

    @contextmanager
    def pretrain_context(self, *names: str):
        """Unfreeze ``names`` for the duration of the context (parity: :137)."""
        logger.info("Entering pre-training context; unlocking: %s", names)
        self.unfix_module(*names)
        try:
            yield
        finally:
            logger.info("Exiting pre-training context; locking: %s", names)
            self.fix_module(*names)

    def frozen_mask(self, params):
        """Pytree of bools marking *trainable* leaves (True = update)."""
        import jax
        frozen = self._frozen

        def trainable(path, _):
            return not any(str(p) in frozen or getattr(p, "key", None) in frozen
                           for p in path)

        return jax.tree_util.tree_map_with_path(trainable, params)

    def save_pretrained(self, path):
        import jax
        with open(path, "wb") as f:
            pickle.dump(jax.device_get(self.params), f)

    def load_pretrained(self, path):
        with open(path, "rb") as f:
            self.params = pickle.load(f)


# Backwards-compatible alias matching the reference class name.
TorchNNPretrain = NNPretrain


class BaseClassificationMethod(BaseMethod):

    _DEFAULT_METRIC = "acc"


class BaseRegressionMethod(BaseMethod):

    _DEFAULT_METRIC = "mse"


class BaseClusteringMethod(BaseMethod):

    _DEFAULT_METRIC = "ari"

    def score(self, x, y, *, score_func=None, return_pred: bool = False, valid_idx=None,
              test_idx=None):
        y_pred = self.predict(x)
        func = resolve_score_func(score_func or self._DEFAULT_METRIC)
        if valid_idx is None:
            score = func(y, y_pred)
            return (score, y_pred) if return_pred else score
        scores = {"valid_score": func([y[i] for i in valid_idx],
                                      [y_pred[i] for i in valid_idx]),
                  "test_score": func([y[i] for i in test_idx],
                                     [y_pred[i] for i in test_idx])}
        return (scores, y_pred) if return_pred else scores

    def fit_score(self, x, y, *, score_func=None, return_pred: bool = False,
                  valid_idx=None, test_idx=None, **fit_kwargs):
        self.fit(x, **fit_kwargs)
        return self.score(x, y, score_func=score_func, return_pred=return_pred,
                          valid_idx=valid_idx, test_idx=test_idx)


__all__ = ["BaseClassificationMethod", "BaseClusteringMethod", "BaseMethod",
           "BasePretrain", "BaseRegressionMethod", "NNPretrain", "TorchNNPretrain"]

"""SPOTlight: NMF + double-NNLS topic deconvolution on device.

Parity target: dance/modules/spatial/cell_type_deconvo/spotlight.py (NMF of the
reference counts — basis optionally seeded from cell-type profiles — then NNLS
of the basis onto mixtures for mix-topic profiles, then NNLS of cell-topic
profiles onto mix-topic profiles for proportions). torchnmf is replaced by the
jitted multiplicative-update NMF/NNLS in :mod:`dance_tpu.ops.nmf`.
"""

from functools import partial

import numpy as np

from dance_tpu.modules.base import BaseRegressionMethod
from dance_tpu.settings import logger
from dance_tpu.transforms import SetConfig
from dance_tpu.transforms.pseudobulk import get_ct_profile
from dance_tpu.typing import Any, List, LogLevel, Optional
from dance_tpu.utils.metrics import resolve_score_func
from dance_tpu.utils.wrappers import as_numpy


class SPOTlight(BaseRegressionMethod):
    """SPOTlight model (parity: spotlight.py:98)."""

    def __init__(self, ref_count, ref_annot, ct_select: List[str], rank: int = 2,
                 bias: bool = False, init_bias=None, device: str = "auto"):
        self.ref_count = as_numpy(ref_count)
        self.ref_annot = as_numpy(ref_annot)
        self.ct_select = list(ct_select)
        self.rank = rank
        self.bias = bias

    @staticmethod
    def preprocessing_pipeline(log_level: LogLevel = "INFO"):
        return SetConfig({"label_channel": "cell_type_portion"}, log_level=log_level)

    def fit(self, x, lr: float = 1e-3, max_iter: int = 1000):
        """x: mixture expression (spots × genes)."""
        import jax
        from dance_tpu.ops.nmf import nmf
        # DEFAULT (single-bf16-pass) matmuls in the MU loops: the updates are
        # self-correcting ratio iterations, and HIGHEST costs a 6-pass f32
        # emulation on the MXU — ~6× the per-iteration work for no metric
        # change at deconvolution scales (full-tier MSE floors unchanged)
        nmf = partial(nmf, precision=jax.lax.Precision.DEFAULT)
        x = as_numpy(x).astype(np.float32)
        x_ref = self.ref_count.T.astype(np.float32)  # gene x cells

        # NMF of reference; seed basis with cell-type profiles when rank matches
        W_init = None
        if self.rank == len(self.ct_select):
            W_init = get_ct_profile(self.ref_count, self.ref_annot,
                                    ct_select=self.ct_select, method="median")
        res = nmf(x_ref, self.rank, n_iter=max_iter, W_init=W_init)
        self.W = np.asarray(res.W)          # gene x topic basis
        self.H = np.asarray(res.H)          # topic x cells coefs

        # cell-topic profiles: per-cell-type medians of topic coefs
        self.H_profile = get_ct_profile(self.H.T, self.ref_annot,
                                        ct_select=self.ct_select, method="median")

        # mix-topic profiles: NNLS basis onto mixtures (X^T ≈ W B)
        res_b = nmf(x.T, self.rank, n_iter=max_iter, W_init=self.W, W_fixed=True)
        self.B = np.asarray(res_b.H)        # topic x spots

        # proportions: NNLS cell-topic profiles onto mix-topic profiles
        res_p = nmf(self.B, len(self.ct_select), n_iter=max_iter,
                    W_init=self.H_profile, W_fixed=True)
        self.P = np.asarray(res_p.H)        # ct x spots
        return self

    def predict(self, x: Optional[Any] = None):
        p = self.P.T  # spots x ct
        return p / np.maximum(p.sum(1, keepdims=True), 1e-12)

    def score(self, x, y, *, score_func=None, return_pred: bool = False,
              valid_idx=None, test_idx=None):
        y_pred = self.predict(x)
        func = resolve_score_func(score_func or "mse")
        y = as_numpy(y)
        if valid_idx is None:
            s = func(y, y_pred)
            return (s, y_pred) if return_pred else s
        vs, ts = func(y[valid_idx], y_pred[valid_idx]), func(y[test_idx],
                                                             y_pred[test_idx])
        return (vs, ts, y_pred) if return_pred else (vs, ts)

    def fit_score(self, x, y, *, score_func=None, return_pred: bool = False,
                  valid_idx=None, test_idx=None, **fit_kwargs):
        self.fit(x, **fit_kwargs)
        return self.score(x, y, score_func=score_func, return_pred=return_pred,
                          valid_idx=valid_idx, test_idx=test_idx)


class NNLS:
    """Non-negative linear model y ≈ x @ W.T (parity: spotlight.py:31).

    The reference trains a clamped ``nn.Linear`` with Adam; here the
    projected-gradient fit runs as a jitted lax.scan on device, with the same
    call surface (``fit(x, y, max_iter, lr)``, ``forward``/``__call__``).
    """

    def __init__(self, in_dim, out_dim, bias: bool = False, init_bias=None,
                 device: str = "auto"):
        self.in_dim, self.out_dim = in_dim, out_dim
        self.bias = bias
        self.init_bias = init_bias
        self.weight = np.zeros((out_dim, in_dim), np.float32)

    def forward(self, x):
        out = as_numpy(x) @ self.weight.T
        if self.bias and self.init_bias is not None:
            out = out + as_numpy(self.init_bias)
        return out

    __call__ = forward

    def fit(self, x, y, max_iter, lr, print_res: bool = False,
            print_period: int = 100):
        import jax
        import jax.numpy as jnp

        x = jnp.asarray(as_numpy(x), jnp.float32)
        y = jnp.asarray(as_numpy(y), jnp.float32)

        def step(w, _):
            def loss_fn(w):
                return jnp.mean((x @ w.T - y) ** 2)

            loss, g = jax.value_and_grad(loss_fn)(w)
            return jnp.maximum(w - lr * g, 0.0), loss

        w0 = jnp.zeros((self.out_dim, self.in_dim), jnp.float32)
        w, losses = jax.lax.scan(step, w0, None, length=max_iter)
        self.weight = np.asarray(w)
        if print_res:
            for it in range(print_period - 1, max_iter, print_period):
                logger.info("Epoch: %02d/%d Loss: %.5e", it + 1, max_iter,
                            float(losses[it]))
        return self

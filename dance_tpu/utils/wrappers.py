"""Function wrappers and array casting helpers (parity: dance/utils/wrappers.py).

``to_numpy`` generalizes the reference's ``torch_to_numpy`` (wrappers.py:78) to
also pull JAX device arrays back to host.
"""

import functools
import time

import numpy as np

from dance_tpu.settings import logger


def as_numpy(x):
    """Convert jax / torch / list inputs to a numpy array, passthrough otherwise."""
    if isinstance(x, np.ndarray):
        return x
    if hasattr(x, "__array__"):  # jax.Array, pandas, etc.
        return np.asarray(x)
    if hasattr(x, "detach"):  # torch.Tensor
        return x.detach().cpu().numpy()
    return np.asarray(x)


def torch_to_numpy(func):
    """Decorator casting all positional array args to numpy before the call."""

    @functools.wraps(func)
    def wrapped(*args, **kwargs):
        args = [as_numpy(a) if _is_arraylike(a) else a for a in args]
        return func(*args, **kwargs)

    return wrapped


def _is_arraylike(x) -> bool:
    return hasattr(x, "__array__") or hasattr(x, "detach") or isinstance(x, (list, tuple))


def as_1d_array(func):
    """Decorator flattening the output into a 1-d numpy array."""

    @functools.wraps(func)
    def wrapped(*args, **kwargs):
        return np.asarray(func(*args, **kwargs)).ravel()

    return wrapped


class CastOutputType:
    """Decorator casting the function output with ``target_type``."""

    def __init__(self, target_type):
        self.target_type = target_type

    def __call__(self, func):
        @functools.wraps(func)
        def wrapped(*args, **kwargs):
            return self.target_type(func(*args, **kwargs))

        return wrapped


class TimeIt:
    """Decorator logging wall-clock time of the call (parity: wrappers.py:40)."""

    def __init__(self, name: str = None):
        self.name = name

    def __call__(self, func):
        name = self.name or func.__name__

        @functools.wraps(func)
        def wrapped(*args, **kwargs):
            t0 = time.perf_counter()
            out = func(*args, **kwargs)
            logger.info("Took %.2f seconds to %s", time.perf_counter() - t0, name)
            return out

        return wrapped


def add_mod_and_transform(cls):
    """Class decorator adding an optional ``mod`` arg to a transform so it can be
    applied to a single modality of a MuData-like container.

    Parity: dance/utils/wrappers.py:97. The wrapped ``__call__`` extracts the
    requested modality as a standalone single-modality view, applies the
    transform to it, then writes results back to the parent container.
    """
    orig_init = cls.__init__
    orig_call = cls.__call__

    @functools.wraps(orig_init)
    def __init__(self, *args, mod=None, **kwargs):
        self.mod = mod
        orig_init(self, *args, **kwargs)

    @functools.wraps(orig_call)
    def __call__(self, data, *args, **kwargs):
        if getattr(self, "mod", None) is None:
            return orig_call(self, data, *args, **kwargs)
        from dance_tpu.data import Data
        sub = Data(data.data.mod[self.mod])
        out = orig_call(self, sub, *args, **kwargs)
        data.data.mod[self.mod] = sub.data
        return data if out is not None else None

    cls.__init__ = __init__
    cls.__call__ = __call__
    return cls


def transform_mod_to_anndata(mod_data, mod_key: str):
    """Extract one modality's AnnData from a MuData-like container
    (parity: dance/utils/wrappers.py:135)."""
    return mod_data.mod[mod_key]


def as_device(x, dtype=None):
    """``jnp.asarray`` with torch handling.

    Device arrays pass through WITHOUT a host round-trip — the
    ``jnp.asarray(as_numpy(x))`` idiom silently downloads + re-uploads a
    pre-uploaded input (~80 MB of relay traffic per fit at bench scale).
    Use this for fit/predict array inputs that feed jitted code.
    """
    import jax.numpy as jnp
    if hasattr(x, "detach"):  # torch.Tensor
        x = x.detach().cpu().numpy()
    return jnp.asarray(x, dtype)

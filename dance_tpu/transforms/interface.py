"""Function-wrapping transform (parity: dance/transforms/interface.py:9).

``AnnDataTransform`` wraps any in-place AnnData function. Dotted-string
resolution maps ``scanpy.pp.*`` / ``sc.pp.*`` names onto the first-party
:mod:`dance_tpu.sc` implementations so reference pipeline YAMLs stay valid
without scanpy installed.
"""

import importlib

from dance_tpu.registry import register_preprocessor
from dance_tpu.transforms.base import BaseTransform
from dance_tpu.typing import Callable, Union

_SCANPY_ALIASES = ("scanpy", "sc", "dance_tpu.sc")


def _resolve_func(name: str) -> Callable:
    parts = name.split(".")
    if parts[0] in ("scanpy", "sc"):
        mod = importlib.import_module("dance_tpu.sc." + ".".join(parts[1:-1]))
        return getattr(mod, parts[-1])
    mod = importlib.import_module(".".join(parts[:-1]))
    return getattr(mod, parts[-1])


@register_preprocessor("interface")
class AnnDataTransform(BaseTransform):
    """Apply ``func(adata, **kwargs)`` in place on the wrapped AnnData."""

    _DISPLAY_ATTRS = ("func_name",)

    def __init__(self, func: Union[Callable, str], **kwargs):
        base_kwargs = {k: kwargs.pop(k) for k in ("out", "log_level") if k in kwargs}
        super().__init__(**base_kwargs)
        if isinstance(func, str):
            self.func_name = func
            func = _resolve_func(func)
        else:
            self.func_name = f"{func.__module__}.{func.__qualname__}"
        self.func = func
        self.func_kwargs = {k: v for k, v in kwargs.items() if v is not None}

    def __repr__(self):
        kwargs_str = ", ".join(f"{k}={v!r}" for k, v in self.func_kwargs.items())
        return f"{self.name}({self.func_name}, {kwargs_str})"

    def __call__(self, data):
        self.logger.info("Applying %s with %s", self.func_name, self.func_kwargs)
        self.func(data.data, **self.func_kwargs)
        return data

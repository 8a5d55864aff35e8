"""Transform base contract (parity: dance/transforms/base.py:12-49).

Every preprocessing op is a named callable over the Data object with an ``out``
channel, a child logger, and an md5 hexdigest derived from its repr — the
digest keys the preprocessed-data cache (dance/datasets/base.py:100-149).
"""

import hashlib
import warnings
from abc import ABC, abstractmethod

from dance_tpu.settings import logger
from dance_tpu.typing import LogLevel, Optional, Tuple


class BaseTransform(ABC):

    _DISPLAY_ATTRS: Tuple[str, ...] = ()

    def __init__(self, out: Optional[str] = None, log_level: LogLevel = "WARNING"):
        self.out = out or self.name
        self.logger = logger.getChild(self.name)
        self.logger.setLevel(log_level)
        self.log_level = log_level

    @property
    def name(self) -> str:
        return self.__class__.__name__

    def hexdigest(self) -> str:
        return hashlib.md5(repr(self).encode()).hexdigest()

    def __repr__(self) -> str:
        attrs = ", ".join(f"{i}={getattr(self, i)!r}" for i in self._DISPLAY_ATTRS)
        return f"{self.name}({attrs})"

    @abstractmethod
    def __call__(self, data):
        raise NotImplementedError


class AnnDataAdaptor:
    """Apply a dance transform directly to an AnnData (parity: base.py:52)."""

    def __init__(self, transform, **data_init_kwargs):
        warnings.warn("AnnDataAdaptor is a compatibility patch; use Data objects directly.",
                      UserWarning, stacklevel=2)
        self.transform = transform
        self.data_init_kwargs = data_init_kwargs

    def __call__(self, adata):
        from dance_tpu.data import Data
        data = Data(adata, **self.data_init_kwargs)
        self.transform(data)
        return data.data

"""Shared type aliases (parity: dance/typing.py:32-42, extended with "jax").

``FeatType`` gains ``"jax"`` relative to the reference: ``get_feature`` can hand
back device-resident ``jnp`` arrays directly, which is where host data crosses
onto the TPU.
"""

from typing import (Any, Callable, Dict, Iterator, List, Literal, Mapping, Optional, Sequence,
                    Set, Tuple, Union)

import numpy as np

FeatType = Literal["anndata", "default", "numpy", "torch", "sparse", "jax"]
NormMode = Literal["normalize", "standardize", "minmax", "l2"]
LogLevel = Literal["NOTSET", "DEBUG", "INFO", "WARNING", "ERROR", "CRITICAL"]
ConfigLike = Union[Dict[str, Any], "dance_tpu.config.Config"]  # noqa: F821
PathLike = Union[str, "os.PathLike"]  # noqa: F821
FileExistHandle = Literal["none", "warn", "error"]

Number = Union[int, float, np.integer, np.floating]

__all__ = [
    "Any", "Callable", "ConfigLike", "Dict", "FeatType", "FileExistHandle", "Iterator",
    "List", "Literal", "LogLevel", "Mapping", "NormMode", "Number", "Optional", "PathLike",
    "Sequence", "Set", "Tuple", "Union",
]

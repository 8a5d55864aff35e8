"""Config object: a nested, attribute-accessible mapping with YAML/JSON IO.

Parity target: dance/config.py:13-47 (``Config(DictConfig)`` with
``to_dict/to_yaml/dump_json/dump_yaml/from_file`` and overwrite protection).
The reference builds on omegaconf; we build on a plain recursive dict so the
framework has no config-library dependency and configs remain pytree-friendly.
"""

from __future__ import annotations

import json
import os
import warnings
from typing import Any, Dict, Optional

import yaml

from dance_tpu.typing import FileExistHandle, PathLike


def _check_exist(path: PathLike, exist_handle: FileExistHandle):
    if os.path.exists(path):
        msg = f"File exists: {path}"
        if exist_handle == "error":
            raise FileExistsError(msg)
        if exist_handle == "warn":
            warnings.warn(msg, UserWarning, stacklevel=3)


class Config(dict):
    """Nested config with attribute access, deep-copy semantics, and file IO."""

    def __init__(self, data: Optional[Dict[str, Any]] = None, **kwargs):
        super().__init__()
        data = dict(data or {})
        data.update(kwargs)
        for key, val in data.items():
            self[key] = val

    def __setitem__(self, key, val):
        if isinstance(val, dict) and not isinstance(val, Config):
            val = Config(val)
        elif isinstance(val, (list, tuple)):
            val = [Config(v) if isinstance(v, dict) and not isinstance(v, Config) else v
                   for v in val]
        super().__setitem__(key, val)

    def __getattr__(self, key):
        try:
            return self[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def __setattr__(self, key, val):
        self[key] = val

    def __delattr__(self, key):
        del self[key]

    # --- conversions -----------------------------------------------------

    def to_dict(self) -> Dict[str, Any]:
        def conv(v):
            if isinstance(v, Config):
                return {k: conv(x) for k, x in v.items()}
            if isinstance(v, list):
                return [conv(x) for x in v]
            return v

        return conv(self)

    def to_yaml(self) -> str:
        return yaml.safe_dump(self.to_dict(), sort_keys=False)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2)

    def copy(self) -> "Config":
        return Config(self.to_dict())

    # --- file IO ---------------------------------------------------------

    def dump_json(self, path: PathLike, exist_handle: FileExistHandle = "warn"):
        _check_exist(path, exist_handle)
        with open(path, "w") as f:
            f.write(self.to_json())

    def dump_yaml(self, path: PathLike, exist_handle: FileExistHandle = "warn"):
        _check_exist(path, exist_handle)
        with open(path, "w") as f:
            f.write(self.to_yaml())

    @classmethod
    def from_file(cls, path: PathLike) -> "Config":
        path = str(path)
        with open(path) as f:
            if path.endswith(".json"):
                data = json.load(f)
            elif path.endswith((".yml", ".yaml")):
                data = yaml.safe_load(f)
            else:
                raise ValueError(f"Unknown config file type: {path}")
        return cls(data or {})

    # --- merge -----------------------------------------------------------

    def merge(self, other: Dict[str, Any]) -> "Config":
        """Recursively merge ``other`` into a copy of self (other wins)."""
        out = self.copy()
        for key, val in other.items():
            if key in out and isinstance(out[key], Config) and isinstance(val, dict):
                out[key] = out[key].merge(val)
            else:
                out[key] = val
        return out


def default_parser_processor(fn=None):
    """Decorator-compatible passthrough retained for API parity."""
    return fn


__all__ = ["Config"]

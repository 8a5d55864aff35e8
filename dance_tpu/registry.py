"""Hierarchical dot-key registry powering pipeline search.

Parity target: dance/registry.py:9-240. The exact dot-scope names form the
public API of the pipeline-search system (SURVEY.md Appendix A), so semantics
here match the reference: ``DotDict`` compositional get/set, ``Registry.children``
enumeration, the ``register(*scope)`` decorator, and ``resolve_from_registry``
with the ``_registry_`` prefix convention.
"""

from functools import partial
from typing import Any, Dict, Iterator, Optional, Tuple

from dance_tpu.settings import logger

REGISTRY_PREFIX = "_registry_"


class DotDict(dict):
    """Dict with dot-compositional key access: ``d.get("a.b") == d["a"]["b"]``."""

    __getattr__ = dict.__getitem__
    __setattr__ = dict.__setitem__
    __delattr__ = dict.__delitem__

    def __init__(self, data: Optional[Dict[str, Any]] = None):
        super().__init__()
        for key, val in (data or {}).items():
            if "." in key:
                raise ValueError(f"DotDict keys may not contain '.': {key!r}")
            self[key] = DotDict(val) if hasattr(val, "keys") else val

    def get(self, key: str, default: Any = None, missed_ok: bool = True,
            create_on_miss: bool = False):
        if create_on_miss and not missed_ok:
            raise ValueError("create_on_miss requires missed_ok")
        if key == "":
            return self
        node = self
        for part in key.split("."):
            try:
                node = node[part]
            except (KeyError, TypeError) as e:
                if create_on_miss:
                    new = DotDict()
                    self.set(key, new)
                    return new
                if missed_ok:
                    return default
                raise KeyError(f"Failed to resolve key {key!r}") from e
        return node

    def set(self, key: str, val: Any, exist_ok: bool = True):
        if not exist_ok and self.get(key) is not None:
            raise KeyError(f"Key exists: {key}")
        parts = key.split(".")
        node = self
        for i, part in enumerate(parts[:-1]):
            node = node.setdefault(part, DotDict())
            if not isinstance(node, DotDict):
                raise KeyError(f"Level {i} ({part!r}) is a leaf node: {node}")
        node[parts[-1]] = val


class Registry(DotDict):

    def is_leaf_node(self, key: str) -> bool:
        return not isinstance(self.get(key), DotDict)

    def children(self, key: str = "", leaf_node: bool = True, non_leaf_node: bool = True,
                 return_val: bool = False, _level: int = 0) -> Iterator[Any]:
        """Depth-first iteration over children keys (dotted, relative to root)."""
        if not leaf_node and not non_leaf_node:
            raise ValueError("At least one of leaf_node / non_leaf_node must be True")
        node = self.get(key, missed_ok=False)
        if _level == 0 and self.is_leaf_node(key):
            raise KeyError(f"{key} is a leaf node; children requires a non-leaf node")

        def emit(k):
            return (k, self.get(k)) if return_val else k

        for name in node:
            full = f"{key}.{name}".lstrip(".")
            if self.is_leaf_node(full):
                if leaf_node:
                    yield emit(full)
            else:
                if non_leaf_node:
                    yield emit(full)
                yield from self.children(full, leaf_node=leaf_node,
                                         non_leaf_node=non_leaf_node,
                                         return_val=return_val, _level=_level + 1)


REGISTRY = Registry()


def resolve_from_registry(name: str, scope: str, registry: Registry = None):
    """Look up ``<scope>.<name>``; scope may carry the ``_registry_`` prefix."""
    registry = REGISTRY if registry is None else registry
    scope = scope.replace(REGISTRY_PREFIX, "", 1).lstrip(".")
    key = ".".join(filter(None, (scope, name)))
    logger.debug("Resolving from registry: %s", key)
    return registry.get(key, missed_ok=False)


def register(*scope: Tuple[str], name: Optional[str] = None, overwrite: bool = False,
             _registry: Registry = REGISTRY):
    """Decorator registering an object under ``<scope...>.<name or obj.__name__>``."""

    def deco(obj):
        obj_name = name if name is not None else obj.__name__
        key = ".".join((*scope, obj_name))
        try:
            _registry.set(key, obj, exist_ok=overwrite)
        except KeyError as e:
            existing = _registry.get(key)
            if existing != obj:
                raise KeyError(f"{obj_name!r} already registered under {scope}: "
                               f"{existing} != {obj}") from e
        return obj

    return deco


register_dataset = partial(register, "dataset")
register_preprocessor = partial(register, "preprocessor")
register_genestats_func = partial(register, "function", "genestats")
register_metric_func = partial(register, "function", "metric")

REGISTERED_DATASETS = REGISTRY.get("dataset", create_on_miss=True)
REGISTERED_PREPROCESSORS = REGISTRY.get("preprocessor", create_on_miss=True)
REGISTERED_GENESTATS_FUNCS = REGISTRY.get("function.genestats", create_on_miss=True)
REGISTERED_METRIC_FUNCS = REGISTRY.get("function.metric", create_on_miss=True)

__all__ = [
    "DotDict", "REGISTRY", "REGISTRY_PREFIX", "Registry", "register", "register_dataset",
    "register_genestats_func", "register_metric_func", "register_preprocessor",
    "resolve_from_registry",
]

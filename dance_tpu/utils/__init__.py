"""Shared misc utilities (parity: dance/utils/__init__.py:19-136).

Device handling is JAX-native: ``get_device`` resolves ``jax.Device`` objects
and ``set_seed`` threads a single global seed through python/numpy/jax (and
torch when present, for host-side baselines in tests).
"""

import hashlib
import importlib
import os
import random
import re
import warnings
from typing import get_args

import numpy as np

from dance_tpu.settings import logger
from dance_tpu.typing import Any, FileExistHandle, Optional, PathLike


def get_device(device: str = "auto"):
    """Resolve a device spec to a ``jax.Device``.

    ``"auto"`` prefers TPU > GPU > CPU. Also accepts ``"cpu"``, ``"tpu"``,
    ``"tpu:1"`` style strings or an actual ``jax.Device`` (returned as-is).
    """
    import jax

    if not isinstance(device, str):
        return device
    if device == "auto":
        return jax.devices()[0]
    if ":" in device:
        platform, idx = device.split(":")
        return jax.devices(platform)[int(idx)]
    return jax.devices(device)[0]


def hexdigest(x: str, /) -> str:
    return hashlib.md5(x.encode()).hexdigest()


def default(value: Any, default_value: Any):
    return default_value if value is None else value


def is_numeric(s) -> bool:
    try:
        float(s)
        return True
    except (TypeError, ValueError):
        return False


class SimpleIndexDataset:
    """Minimal indexable dataset wrapper (parity: utils/__init__.py:41)."""

    def __init__(self, dataset):
        self.data = dataset

    def __len__(self):
        return len(self.data)

    def __getitem__(self, index):
        return self.data[index]


class Color:
    COLOR_DICT = {
        "blue": "\033[94m",
        "cyan": "\033[96m",
        "green": "\033[92m",
        "yellow": "\033[93m",
        "red": "\033[91m",
    }
    ENDC = "\033[0m"

    def __init__(self, color: str):
        if (code := self.COLOR_DICT.get(color)) is None:
            raise ValueError(f"Unknown color {color}, options: {sorted(self.COLOR_DICT)}")
        self._start = code

    @property
    def start(self) -> str:
        return self._start

    @property
    def end(self) -> str:
        return self.ENDC

    def __call__(self, txt: str) -> str:
        return f"{self._start}{txt}{self.ENDC}"


_GLOBAL_SEED = 42


def set_seed(rndseed: int, extreme_mode: bool = False):
    """Seed python/numpy (+torch if importable) and record the JAX base seed.

    JAX PRNG is functional, so "seeding" means recording the base seed that
    :func:`get_rng` derives keys from. ``extreme_mode`` additionally enables
    deterministic XLA reductions.
    """
    global _GLOBAL_SEED
    _GLOBAL_SEED = int(rndseed)
    os.environ["PYTHONHASHSEED"] = str(rndseed)
    random.seed(rndseed)
    np.random.seed(rndseed)
    try:
        import torch
        torch.manual_seed(rndseed)
    except ImportError:
        pass
    if extreme_mode:
        os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_gpu_deterministic_ops=true"
    logger.info("Setting global random seed to %s", rndseed)


def get_rng(seed: Optional[int] = None):
    """Return a ``jax.random.key`` from the global (or given) seed."""
    import jax
    return jax.random.key(_GLOBAL_SEED if seed is None else seed)


def file_check(path: PathLike, exist_handle: FileExistHandle = "none"):
    if not os.path.isfile(path):
        return
    if exist_handle == "warn":
        warnings.warn(f"File exists! {path}", UserWarning, stacklevel=3)
    elif exist_handle == "error":
        raise FileExistsError(path)
    elif exist_handle != "none":
        raise ValueError(f"Unknown file exist handling: {exist_handle!r}, "
                         f"options: {get_args(FileExistHandle)}")


def try_import(module_name: str, install_name: Optional[str] = None):
    install_name = default(install_name, module_name)
    try:
        return importlib.import_module(module_name)
    except ModuleNotFoundError as e:
        raise ImportError(f"{module_name} not installed. Install with: "
                          f"$ pip install {install_name}") from e


def spilt_web(url: str):
    """Parse a sweep-tracker URL into (entity, project, sweep_id).

    Parity: dance/utils/__init__.py:119 (name kept, typo and all, so tuning
    scripts written against the reference keep working).
    """
    match = re.search(r"https://wandb\.ai/([^/]+)/([^/]+)/sweeps/([^/?]+)", url)
    if match:
        return match.group(1), match.group(2), match.group(3)
    logger.warning("No sweep match found in url: %s", url)
    return None

"""Package-level settings: logger and path constants.

Reference parity: dance/settings.py:7-54 (env-var controlled log level,
path constants, default telemetry entity/project).
"""

import logging
import os
import pathlib

LOGGER_NAME = "dance_tpu"

_LEVEL = os.environ.get("DANCE_TPU_LOG_LEVEL", os.environ.get("DANCE_LOG_LEVEL", "INFO")).upper()

logger = logging.getLogger(LOGGER_NAME)
if not logger.handlers:  # idempotent under re-import
    _handler = logging.StreamHandler()
    _handler.setFormatter(
        logging.Formatter("[%(levelname)s][%(asctime)s][%(name)s][%(funcName)s] %(message)s"))
    logger.addHandler(_handler)
    logger.setLevel(_LEVEL)
    logger.propagate = False


def change_log_level(level: str):
    """Change the package log level (parity: dance/settings.py:32)."""
    logger.setLevel(level.upper())
    for handler in logger.handlers:
        handler.setLevel(level.upper())


# Persistent XLA compilation cache: large-graph GNN backward passes can take
# minutes to compile on the TPU toolchain; caching makes that a once-ever cost
# per (program, shape). Must be set before jax initializes its backend.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/dance_tpu_xla"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

CURDIR = pathlib.Path(".").resolve()
DANCEDIR = pathlib.Path(__file__).resolve().parent.parent
DANCEPKGDIR = pathlib.Path(__file__).resolve().parent
METADIR = DANCEPKGDIR / "metadata"
ATLASDIR = DANCEDIR / "atlas_data"
CACHEDIR = pathlib.Path(os.environ.get("DANCE_TPU_CACHE_DIR", str(CURDIR / "cache")))

EXAMPLESDIR = DANCEDIR / "examples"
SIMILARITYDIR = ATLASDIR / "sc_similarity_examples"

# Default telemetry (sweep summary CSVs always written; external trackers
# optional). Lower-case aliases mirror the reference's settings.py:53-54.
ENTITY = entity = os.environ.get("DANCE_TPU_ENTITY", "dance-tpu")
PROJECT = project = os.environ.get("DANCE_TPU_PROJECT", "dance-tpu")

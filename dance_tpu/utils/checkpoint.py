"""Checkpoint/resume helpers (SURVEY.md §5 parity + orbax upgrade).

The reference checkpoints torch state-dicts (modules/base.py:147-153) with no
optimizer-state resume. Here full training state (params + optimizer state +
step) round-trips through orbax when available, with a pickle fallback — which
adds the mid-training resume capability the reference lacks.
"""

import os
import pickle

from dance_tpu.settings import logger
from dance_tpu.typing import Any, Optional


def _orbax():
    try:
        import orbax.checkpoint as ocp
        return ocp
    except ImportError:
        return None


def save_checkpoint(path: str, state: Any):
    """Save a pytree training state (params / opt_state / step / ...)."""
    import jax
    state = jax.device_get(state)
    ocp = _orbax()
    path = os.path.abspath(path)
    if ocp is not None:
        try:
            ckptr = ocp.PyTreeCheckpointer()
            ckptr.save(path, state, force=True)
            logger.info("Saved orbax checkpoint to %s", path)
            return
        except Exception as e:  # noqa: BLE001 — fall back to pickle
            logger.warning("orbax save failed (%s); falling back to pickle", e)
    with open(path if path.endswith(".pkl") else path + ".pkl", "wb") as f:
        pickle.dump(state, f, protocol=pickle.HIGHEST_PROTOCOL)
    logger.info("Saved pickle checkpoint to %s", path)


def load_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    """Load a pytree training state saved by :func:`save_checkpoint`."""
    ocp = _orbax()
    path = os.path.abspath(path)
    if os.path.isdir(path) and ocp is not None:
        ckptr = ocp.PyTreeCheckpointer()
        state = ckptr.restore(path, item=target)
        logger.info("Loaded orbax checkpoint from %s", path)
        return state
    pkl = path if path.endswith(".pkl") else path + ".pkl"
    with open(pkl, "rb") as f:
        state = pickle.load(f)
    logger.info("Loaded pickle checkpoint from %s", pkl)
    return state

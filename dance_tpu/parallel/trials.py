"""Vmapped multi-trial training: hyperparameter fan-out as a batch axis.

The reference scales sweeps by launching wandb agent *processes*
(dance/pipeline.py:826-850, 997-1008). On TPU the same fan-out becomes a
vmapped axis: N trials' parameters live in one stacked pytree and every
training step advances all trials simultaneously on the MXU — sweeps of small
models cost barely more than one model. Composes with the dp mesh axis for
multi-chip trial parallelism.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dance_tpu.settings import logger
from dance_tpu.typing import Any, Callable, Dict, List, Optional, Sequence


def vmapped_trials(init_fn: Callable, loss_fn: Callable, data, *,
                   seeds: Sequence[int], hyperparams: Optional[Dict[str, Sequence]] = None,
                   lr: float = 1e-3, num_steps: int = 100):
    """Train N trials simultaneously via vmap.

    Parameters
    ----------
    init_fn
        ``init_fn(rng) -> params`` building one trial's parameter pytree.
    loss_fn
        ``loss_fn(params, batch, hyper) -> scalar`` where ``hyper`` is a dict
        of per-trial scalars (one leaf per entry of ``hyperparams``).
    data
        Batch pytree shared across trials (replicated; shard the batch over
        the dp mesh axis for multi-chip sweeps).
    seeds
        One RNG seed per trial (defines N).
    hyperparams
        Optional per-trial scalar arrays, e.g. ``{"lambd": [0.1, 0.01, ...]}``
        — each must have length N.

    Returns
    -------
    (stacked_params, losses): final parameters stacked on axis 0 and the
    (num_steps, N) loss history.
    """
    n = len(seeds)
    hyper = {k: jnp.asarray(v) for k, v in (hyperparams or {}).items()}
    for k, v in hyper.items():
        if v.shape[0] != n:
            raise ValueError(f"hyperparams[{k!r}] has {v.shape[0]} entries, need {n}")

    keys = jnp.stack([jax.random.key(int(s)) for s in seeds])
    params = jax.vmap(init_fn)(keys)
    tx = optax.adam(lr)
    opt_state = jax.vmap(tx.init)(params)

    def one_step(params, opt_state, hyper):
        loss, grads = jax.value_and_grad(loss_fn)(params, data, hyper)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def all_steps(params, opt_state):
        def body(carry, _):
            params, opt_state = carry
            params, opt_state, loss = jax.vmap(one_step)(params, opt_state, hyper)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(body, (params, opt_state), None,
                                                   length=num_steps)
        return params, losses

    params, losses = all_steps(params, opt_state)
    logger.info("Ran %d trials × %d steps vmapped; final losses: %s", n, num_steps,
                np.asarray(losses[-1]).round(4).tolist())
    return params, np.asarray(losses)


def select_best_trial(stacked_params, scores, maximize: bool = True):
    """Extract the winning trial's parameter pytree from the stacked result."""
    idx = int(np.argmax(scores) if maximize else np.argmin(scores))
    return jax.tree_util.tree_map(lambda x: x[idx], stacked_params), idx


__all__ = ["select_best_trial", "vmapped_trials"]

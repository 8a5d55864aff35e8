"""Vmapped multi-trial training: hyperparameter fan-out as a batch axis.

The reference scales sweeps by launching wandb agent *processes*
(dance/pipeline.py:826-850, 997-1008). On TPU the same fan-out becomes a
vmapped axis: N trials' parameters live in one stacked pytree and every
training step advances all trials simultaneously on the MXU — sweeps of small
models cost barely more than one model. Composes with the dp mesh axis for
multi-chip trial parallelism (the trial axis is sharded over ``dp``; each
device trains its slice of the trials with zero collectives).
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
                   lr=1e-3, num_steps: int = 100, mesh=None, mesh_axis: str = "dp"):
    """Train N trials simultaneously via vmap.

    Parameters
    ----------
    init_fn
        ``init_fn(rng) -> params`` building one trial's parameter pytree.
    loss_fn
        ``loss_fn(params, batch, hyper) -> scalar`` where ``hyper`` is a dict
        of per-trial scalars (one leaf per entry of ``hyperparams``).
    data
        Batch pytree shared across trials (replicated across the mesh).
    seeds
        One RNG seed per trial (defines N).
    hyperparams
        Optional per-trial scalar arrays, e.g. ``{"lambd": [0.1, 0.01, ...]}``
        — each must have length N.
    lr
        Scalar, or a length-N sequence for per-trial Adam learning rates
        (implemented as adam(1.0) with per-trial update scaling — identical
        arithmetic to adam(lr) per trial).
    mesh
        Optional ``jax.sharding.Mesh``: the TRIAL axis is sharded over
        ``mesh_axis`` (embarrassingly parallel — no collectives), data is
        replicated. N is padded up to a multiple of the axis size internally;
        padded trials are dropped from the returned arrays.

    Returns
    -------
    (stacked_params, losses): final parameters stacked on axis 0 and the
    (num_steps, N) loss history.
    """
    n = len(seeds)
    seeds = list(seeds)
    hyper = {k: jnp.asarray(v, jnp.float32) for k, v in (hyperparams or {}).items()}
    for k, v in hyper.items():
        if v.shape[0] != n:
            raise ValueError(f"hyperparams[{k!r}] has {v.shape[0]} entries, need {n}")

    per_trial_lr = hasattr(lr, "__len__")
    if per_trial_lr:
        lr_arr = jnp.asarray(lr, jnp.float32)
        if lr_arr.shape[0] != n:
            raise ValueError(f"lr has {lr_arr.shape[0]} entries, need {n}")
    else:
        lr_arr = jnp.full((n,), float(lr), jnp.float32)

    # pad the trial axis to a multiple of the mesh axis so sharding is even
    n_pad = n
    if mesh is not None:
        size = mesh.shape[mesh_axis]
        if n % size:
            extra = size - n % size
            seeds = seeds + [seeds[-1]] * extra
            hyper = {k: jnp.concatenate([v, jnp.repeat(v[-1:], extra, 0)])
                     for k, v in hyper.items()}
            lr_arr = jnp.concatenate([lr_arr, jnp.repeat(lr_arr[-1:], extra, 0)])
            n_pad = n + extra

    keys = jnp.stack([jax.random.key(int(s)) for s in seeds])
    params = jax.vmap(init_fn)(keys)
    # adam(1.0) + per-trial update scaling == adam(lr) per trial
    tx = optax.adam(1.0)
    opt_state = jax.vmap(tx.init)(params)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        trial_sharding = NamedSharding(mesh, P(mesh_axis))
        repl = NamedSharding(mesh, P())
        put_trial = lambda t: jax.tree_util.tree_map(
            lambda x: jax.device_put(x, trial_sharding), t)
        params = put_trial(params)
        opt_state = put_trial(opt_state)
        hyper = put_trial(hyper)
        lr_arr = jax.device_put(lr_arr, trial_sharding)
        data = jax.tree_util.tree_map(
            lambda x: jax.device_put(jnp.asarray(x), repl), data)

    def one_step(params, opt_state, hyper, lr_scalar):
        loss, grads = jax.value_and_grad(loss_fn)(params, data, hyper)
        updates, opt_state = tx.update(grads, opt_state, params)
        updates = jax.tree_util.tree_map(lambda u: u * lr_scalar, updates)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def all_steps(params, opt_state, lr_arr):
        def body(carry, _):
            params, opt_state = carry
            params, opt_state, loss = jax.vmap(one_step)(params, opt_state, hyper,
                                                         lr_arr)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(body, (params, opt_state), None,
                                                   length=num_steps)
        return params, losses

    params, losses = all_steps(params, opt_state, lr_arr)
    if n_pad != n:  # drop the padding trials
        params = jax.tree_util.tree_map(lambda x: x[:n], params)
        losses = losses[:, :n]
    logger.info("Ran %d trials × %d steps vmapped; final losses: %s", n, num_steps,
                np.asarray(losses[-1]).round(4).tolist())
    return params, np.asarray(losses)


def select_best_trial(stacked_params, scores, maximize: bool = True):
    """Extract the winning trial's parameter pytree from the stacked result."""
    idx = int(np.argmax(scores) if maximize else np.argmin(scores))
    return jax.tree_util.tree_map(lambda x: x[idx], stacked_params), idx


__all__ = ["select_best_trial", "vmapped_trials"]

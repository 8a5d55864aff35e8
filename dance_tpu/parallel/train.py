"""Sharded training-step builder: dp batch sharding × tp parameter sharding.

Builds a jitted full training step over a named mesh. The batch rides the
``dp`` axis, large Dense kernels are column-sharded over ``tp``
(:func:`dance_tpu.parallel.mesh.shard_params_for_tp`), and XLA inserts the
gradient psum / activation collectives. This is the generic scale-out path the
model zoo shares; it runs unchanged on 1 chip, a v5e slice, or a virtual CPU
mesh.
"""

from typing import Callable

import jax
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from dance_tpu.parallel.mesh import shard_batch, shard_params_for_tp


def make_sharded_train_step(loss_fn: Callable, tx: optax.GradientTransformation,
                            mesh) -> Callable:
    """Return ``step(params, opt_state, batch) -> (params, opt_state, loss)``.

    ``loss_fn(params, batch) -> scalar``. Input/output shardings are inferred
    from the argument placements (set them with :func:`shard_params_for_tp` /
    :func:`shard_batch`); jit + GSPMD propagate the rest.
    """

    @jax.jit
    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def init_sharded(model, tx, sample_batch, mesh, rng_seed: int = 0,
                 tp_axis: str = "tp", dp_axis: str = "dp", tp_min_size: int = 2048):
    """Init model params replicated+tp-sharded and optimizer state on the mesh."""
    key = jax.random.key(rng_seed)
    x = sample_batch[0] if isinstance(sample_batch, tuple) else sample_batch
    params = model.init(key, x[:1])["params"]
    params = shard_params_for_tp(params, mesh, axis=tp_axis, min_size=tp_min_size)
    opt_state = tx.init(params)
    return params, opt_state


__all__ = ["init_sharded", "make_sharded_train_step"]

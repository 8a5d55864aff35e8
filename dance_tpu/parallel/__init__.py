"""Device mesh + sharding helpers — the framework's scale-out backbone.

The reference has no distributed strategy at all (SURVEY.md §2.8); scale here
is first-class: a ``jax.sharding.Mesh`` over the slice with named ``dp`` (data/
batch) and ``tp`` (model/hidden) axes, NamedSharding annotations on batches and
parameters, and XLA-inserted collectives over ICI. Works identically on one
chip, a v5e-8 slice, or a forced-multi-device CPU for testing.
"""

from dance_tpu.parallel.mesh import (current_mesh, get_mesh, replicate, shard_batch,
                                     shard_params_for_tp)

__all__ = ["current_mesh", "get_mesh", "replicate", "shard_batch", "shard_params_for_tp"]

"""Mesh construction and sharding rules."""

import contextlib
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_CURRENT_MESH: Optional[Mesh] = None
_DP_MESH: Optional[Mesh] = None  # active data-parallel fit context


def get_mesh(shape: Optional[Tuple[int, ...]] = None,
             axis_names: Sequence[str] = ("dp", "tp"),
             devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build (and remember) a device mesh.

    Default layout puts all devices on the ``dp`` axis with ``tp=1`` — the
    right choice for the small-model / many-cells regime of single-cell
    workloads where batch sharding rides ICI and parameters are replicated.
    Pass an explicit ``shape`` (e.g. ``(2, 4)``) for dp×tp hybrid layouts.
    """
    global _CURRENT_MESH
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"Mesh shape {shape} does not match device count {n}")
    mesh = Mesh(np.asarray(devices).reshape(shape), axis_names=tuple(axis_names))
    _CURRENT_MESH = mesh
    return mesh


def current_mesh() -> Mesh:
    return _CURRENT_MESH if _CURRENT_MESH is not None else get_mesh()


def shard_batch(batch, mesh: Optional[Mesh] = None, axis: str = "dp"):
    """Place a batch pytree with its leading axis sharded over ``axis``."""
    mesh = mesh or current_mesh()
    sharding = NamedSharding(mesh, P(axis))

    def put(x):
        x = np.asarray(x)
        if x.ndim == 0:
            return jax.device_put(x, NamedSharding(mesh, P()))
        # pad leading dim to a multiple of the axis size so sharding is even
        size = mesh.shape[axis]
        if x.shape[0] % size:
            pad = size - x.shape[0] % size
            x = np.concatenate([x, np.repeat(x[-1:], pad, axis=0)], axis=0)
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def replicate(tree, mesh: Optional[Mesh] = None):
    """Replicate a pytree across the mesh."""
    mesh = mesh or current_mesh()
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def shard_params_for_tp(params, mesh: Optional[Mesh] = None, axis: str = "tp",
                        min_size: int = 2048):
    """Tensor-parallel parameter placement: 2-d kernels whose output dim is
    divisible by the tp axis (and large enough to be worth sharding) are
    column-sharded; everything else is replicated. XLA inserts the matching
    all-gathers/reduce-scatters.
    """
    mesh = mesh or current_mesh()
    tp = mesh.shape[axis]

    def place(x):
        if (hasattr(x, "ndim") and x.ndim == 2 and tp > 1 and x.shape[1] % tp == 0
                and x.size >= min_size):
            return jax.device_put(x, NamedSharding(mesh, P(None, axis)))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(place, params)


@contextlib.contextmanager
def dp_context(mesh: Optional[Mesh] = None):
    """Activate data-parallel placement for :func:`to_device` calls.

    ``BaseMethod.fit_distributed`` wraps the model's standard ``fit`` in this
    context; every model converts its input arrays through :func:`to_device`,
    which inside the context shards the cells axis over ``dp`` instead of
    placing a replicated array. Outside the context, behavior is identical to
    ``jnp.asarray``.
    """
    global _DP_MESH
    prev, _DP_MESH = _DP_MESH, (mesh or current_mesh())
    try:
        with _DP_MESH:
            yield _DP_MESH
    finally:
        _DP_MESH = prev


def to_device(x, dtype=None, *, batch_axis: int = 0, pad: bool = True):
    """``jnp.asarray`` that dp-shards the batch axis inside :func:`dp_context`.

    With ``pad=True`` (dense training data) the batch axis is padded to a
    multiple of the dp size by repeating the last row (same policy as
    :func:`shard_batch`) — negligible for the many-cells regime this targets.
    With ``pad=False`` (e.g. graph node features whose row count must stay in
    sync with an adjacency) a non-divisible axis replicates instead.
    Scalars/1-d-mismatched inputs replicate.
    """
    import jax.numpy as jnp
    if hasattr(x, "detach"):  # torch.Tensor
        x = x.detach().cpu().numpy()
    if _DP_MESH is None:
        # jnp.asarray is a no-op for a device array of the right dtype, so
        # callers may pass pre-uploaded inputs and skip the host→device copy
        return jnp.asarray(x, dtype) if dtype is not None else jnp.asarray(x)
    mesh = _DP_MESH
    x = np.asarray(x, dtype)
    if x.ndim <= batch_axis:
        return jax.device_put(x, NamedSharding(mesh, P()))
    size = mesh.shape["dp"]
    if x.shape[batch_axis] % size:
        if not pad:
            return jax.device_put(x, NamedSharding(mesh, P()))
        n_pad = size - x.shape[batch_axis] % size
        tail = np.repeat(np.take(x, [-1], axis=batch_axis), n_pad, axis=batch_axis)
        x = np.concatenate([x, tail], axis=batch_axis)
    spec = [None] * x.ndim
    spec[batch_axis] = "dp"
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


def dp_active() -> bool:
    return _DP_MESH is not None


def active_dp_mesh() -> Optional[Mesh]:
    """The mesh of the surrounding :func:`dp_context`, or None."""
    return _DP_MESH


__all__ = ["active_dp_mesh", "current_mesh", "dp_active", "dp_context",
           "get_mesh", "replicate", "shard_batch", "shard_params_for_tp",
           "to_device"]

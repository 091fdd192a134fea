"""Mesh construction and sharding utilities.

Default topology is a single ``data`` axis over every addressable device —
PVNet is a ~15M-param CNN, so data parallelism saturates any slice; the axis
layout is kept extensible (``axis_names``) so model axes can be added without
touching call sites.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Tuple[int, ...]] = None,
              axis_names: Sequence[str] = ("data",),
              devices=None) -> Mesh:
    """Build a device mesh.

    Args:
      shape: mesh shape; None means all devices on the first axis.
      axis_names: one name per mesh dim; default 1-axis ('data',).
      devices: explicit device list (defaults to jax.devices()).
    """
    if devices is None and jax.process_count() > 1:
        # Multi-host: jax.devices() returns the GLOBAL device list, but
        # shard_batch/replicate below device_put from *this* host — under
        # multiple processes that silently builds a mesh whose sharding
        # disagrees with what other hosts feed it. Use make_global_mesh()
        # + shard_batch_global()/replicate_global() instead (the
        # reference itself is single-node, SURVEY §2.7).
        raise NotImplementedError(
            "make_mesh() supports a single process; got "
            f"jax.process_count()={jax.process_count()}. Use "
            "make_global_mesh() with shard_batch_global()/"
            "replicate_global(), or pass an explicit device list.")
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names=tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding for batch-major arrays: dim 0 split over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated sharding (params, small constants)."""
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Device-put a host batch pytree, dim-0-sharded over the mesh."""
    s = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def replicate(tree, mesh: Mesh):
    """Device-put a pytree fully replicated over the mesh."""
    s = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def make_global_mesh(shape: Optional[Tuple[int, ...]] = None,
                     axis_names: Sequence[str] = ("data",)) -> Mesh:
    """Mesh over every device of every process (multi-host).

    Requires jax.distributed.initialize() to have run on each process.
    Feed it with shard_batch_global (per-process local batches) and
    replicate_global (identical pytrees on every process) — plain
    shard_batch/replicate device_put host-local data and would corrupt
    batches across hosts (see make_mesh). Collectives ride ICI within a
    slice and DCN across; with a single 'data' axis the only cross-host
    traffic is the gradient psum."""
    devices = jax.devices()                       # global list
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names=tuple(axis_names))


def shard_batch_global(batch, mesh: Mesh, axis: str = "data"):
    """Build dim-0-sharded GLOBAL arrays from per-process local batches.

    Each process passes its own rows (global_batch / process_count of
    them, in process-index order); the result is a global jax.Array
    pytree usable under jit with the mesh's sharding, with no cross-host
    data movement (each host's rows land on its own devices)."""
    s = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(s, np.asarray(x)),
        batch)


def replicate_global(tree, mesh: Mesh):
    """Build fully-replicated global arrays from identical host pytrees.

    Every process must pass the same values (e.g. params loaded from the
    same checkpoint, or broadcast via jax.experimental.multihost_utils)."""
    s = replicated_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            s, np.asarray(x)), tree)

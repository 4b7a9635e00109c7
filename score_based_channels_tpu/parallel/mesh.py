"""Device mesh + sharding helpers (SURVEY.md §2.4).

The reference is single-process single-GPU; the scalable axes of this
workload are {channel realizations × SNR grid × hyper-parameter combos},
which we flatten into one batch axis and shard over a 1-D ('data',) mesh.
The 5.9M-param score model is replicated (TP/PP unnecessary at this size,
SURVEY.md §2.4), so the only collectives are:
  - gradient psum in the data-parallel DSM trainer (inserted by XLA from
    the sharded-batch mean), and
  - the final NMSE trace gather at the end of inference.

Multi-host: call jax.distributed.initialize() before building the mesh;
everything below uses global devices and works unchanged.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array


def make_mesh(num_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    """1-D mesh over the first `num_devices` global devices."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis,))


def data_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    """Shard the leading axis over the mesh, replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicate(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, axis: str = "data"):
    """Device_put every array in the tree with leading-axis sharding."""

    def _put(x):
        x = jax.numpy.asarray(x)
        if x.ndim == 0:
            return jax.device_put(x, replicate(mesh))
        return jax.device_put(x, data_sharding(mesh, x.ndim, axis))

    return jax.tree_util.tree_map(_put, tree)


def pad_to_multiple(x, multiple: int, axis: int = 0):
    """Pad the batch axis to a device-count multiple; returns (padded, n_valid)."""
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    pad_width = [(0, 0)] * x.ndim
    pad_width[axis] = (0, rem)
    edge = jax.numpy.take(x, jax.numpy.arange(rem) % n, axis=axis)
    return jax.numpy.concatenate([x, edge], axis=axis), n

"""Device mesh + sharding helpers.

The reference's distributed story is pure DDP data parallelism over NCCL
(SURVEY §2.5; ``detectron2.engine.launch`` in
``DVIS_Plus/train_net_video.py:322-329``). TPU-native equivalent: a
``jax.sharding.Mesh`` with a ``data`` axis (and an optional ``model`` axis for
large backbones), jit auto-partitioning with NamedSharding constraints, and
XLA collectives over ICI instead of NCCL all-reduce. Gradient reduction falls
out of jit: the loss is a global mean over the data-sharded batch.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def build_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    model_parallel_size: int = 1,
    data_axis: str = "data",
    model_axis: str = "model",
) -> Mesh:
    """(n_devices/model, model) mesh; model axis innermost so model shards ride
    the fastest ICI links."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    assert n % model_parallel_size == 0, (n, model_parallel_size)
    arr = np.asarray(devices).reshape(n // model_parallel_size, model_parallel_size)
    return Mesh(arr, (data_axis, model_axis))


def data_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    """Batch-leading arrays sharded over the data axis."""
    return NamedSharding(mesh, P(data_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, data_axis: str = "data"):
    """Place a host batch pytree onto the mesh, leading axis over data.

    If the batch size doesn't divide the data axis (e.g. debug runs with 1
    clip on an 8-device mesh), arrays are replicated instead — jit still
    produces correct results, just without data parallelism."""
    n_data = mesh.shape[data_axis]
    leaves = jax.tree.leaves(batch)
    divisible = all(l.shape[0] % n_data == 0 for l in leaves)
    sh = data_sharding(mesh, data_axis) if divisible else replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)

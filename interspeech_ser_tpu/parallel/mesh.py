"""Device mesh + sharding helpers (the distributed story).

The reference is a single-GPU codebase (SURVEY.md §2.9: no torch.distributed
anywhere); on TPU the equivalent-and-better is single-controller JAX over a
v5e slice: batch-sharded data parallelism via ``jit`` with ``NamedSharding``,
XLA emitting the ICI all-reduces. Tensor-parallel axes are provisioned here
for the 2B-param w2v2-XLS-R encoder (sharded over 'model' when per-chip HBM
demands it); DCN multi-slice is explicitly out of scope for parity.

All helpers degrade gracefully to a 1-device mesh on a single chip, and are
exercised on a virtual 8-device CPU mesh in tests and in
``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    data_axis: str = "data",
    model_axis: Optional[str] = None,
    model_parallel: int = 1,
) -> Mesh:
    """Build a 1-D data mesh or a 2-D (data, model) mesh.

    Args:
        n_devices: number of devices to use (default: all).
        model_parallel: size of the model axis (1 = pure data parallel).
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if model_parallel > 1:
        assert n % model_parallel == 0
        arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
        return Mesh(arr, (data_axis, model_axis or "model"))
    return Mesh(np.asarray(devices), (data_axis,))


def shard_batch(mesh: Mesh, tree, data_axis: str = "data"):
    """Place a host batch on the mesh, sharded along the leading axis.

    Every leaf must have a leading batch dim divisible by the data-axis size
    (the data pipeline pads batches with masked rows to guarantee this).
    """
    def put(x):
        spec = P(data_axis, *([None] * (np.ndim(x) - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def batch_sharding(mesh: Mesh, ndim: int, data_axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(data_axis, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())

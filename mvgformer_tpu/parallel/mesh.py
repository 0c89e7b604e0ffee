"""Mesh + sharding helpers.

Replaces the reference's process-group bootstrap
(/root/reference/lib/utils/misc.py:400-425: torchrun env vars + NCCL init)
with jax device meshes. Multi-host execution only needs
jax.distributed.initialize() before make_mesh(); the same compiled program
covers ICI within a slice and DCN across hosts.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None,
              axis_name: str = "data") -> Mesh:
    """A 1-D data-parallel mesh over the fastest interconnect ordering."""
    devices = jax.devices()
    n = num_devices if num_devices and num_devices > 0 else len(devices)
    mesh_devices = mesh_utils.create_device_mesh((n,), devices[:n])
    return Mesh(mesh_devices, (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim; everything else replicated."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Place a Batch pytree with the leading dim sharded over `axis_name`.

    Scalar/0-d leaves are replicated.
    """
    data = batch_sharding(mesh, axis_name)
    repl = replicated(mesh)

    def place(x):
        x = np.asarray(x) if not hasattr(x, "ndim") else x
        sh = data if getattr(x, "ndim", 0) >= 1 else repl
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map(place, batch)

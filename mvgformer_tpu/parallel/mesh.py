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


def make_mesh_2d(data: int, view: int,
                 axis_names=("data", "view")) -> Mesh:
    """A 2-D (data x view) mesh: batch sharded over 'data', the camera-view
    dimension sharded over 'view' (view parallelism — the per-view backbone
    and projective attention run fully sharded; XLA inserts the all-gathers
    where cross-view reductions need every view: the mean-over-views feature
    fusion, the confidence softmax over views, and triangulation).

    The reference has no model parallelism at all (SURVEY.md §2.8); this is
    a capability the sharded formulation gets from annotations alone."""
    devices = jax.devices()
    n = data * view
    assert n <= len(devices), (data, view, len(devices))
    mesh_devices = mesh_utils.create_device_mesh((data, view), devices[:n])
    return Mesh(mesh_devices, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim; everything else replicated."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "data",
                view_axis: Optional[str] = None):
    """Place a Batch pytree with the leading (batch) dim sharded over
    `axis_name` and, when `view_axis` is given and present in the mesh, the
    second (view) dim sharded over it. Scalar/0-d leaves are replicated.

    Placement is EXPLICIT per top-level field of the Batch dataclass
    (data/meta.py): every leaf under `views` or `view_data` is laid out
    (B, V, ...) and shards (data, view); every leaf under `targets` is
    (B, ...) with a people dim (not views) at axis 1 and shards (data,)
    only. A new Batch field must be placed here deliberately — unknown
    roots raise instead of silently inheriting a wrong sharding.
    """
    data = batch_sharding(mesh, axis_name)
    repl = replicated(mesh)
    use_view = view_axis is not None and view_axis in mesh.axis_names

    def place(path, x):
        x = np.asarray(x) if not hasattr(x, "ndim") else x
        nd = getattr(x, "ndim", 0)
        if nd == 0:
            return jax.device_put(x, repl)
        root = str(getattr(path[0], "name", getattr(path[0], "key", "")))
        if root in ("views", "view_data"):
            if use_view:
                spec = [axis_name, view_axis] + [None] * (nd - 2)
                return jax.device_put(x, NamedSharding(mesh, P(*spec)))
            return jax.device_put(x, data)
        if root == "targets":
            return jax.device_put(x, data)
        raise ValueError(
            f"shard_batch: unplaced Batch field {root!r} — add an explicit "
            "placement rule for it in parallel/mesh.py")

    return jax.tree_util.tree_map_with_path(place, batch)

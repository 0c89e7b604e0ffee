"""Parallelism: device mesh construction and sharding rules.

The reference's only distribution strategy is single-node DDP over NCCL
(SURVEY.md §2.8). The TPU-native equivalent is one jit-compiled train step
over a jax.sharding.Mesh: the batch is sharded over the 'data' axis,
parameters are replicated, and XLA inserts the gradient all-reduce over ICI.
"""

from mvgformer_tpu.parallel.mesh import (
    make_mesh,
    make_mesh_2d,
    batch_sharding,
    replicated,
    shard_batch,
)

__all__ = ["make_mesh", "make_mesh_2d", "batch_sharding", "replicated",
           "shard_batch"]

"""MVGFormer-TPU: a TPU-native multi-view 3D human pose estimation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of MVGFormer
(CVPR'24, "Multiple View Geometry Transformers for 3D Human Pose
Estimation"). The compute path is pure JAX (jit/pjit/shard_map over a device
mesh, Pallas kernels for the projective-attention sampling hot op); the
geometry is vmapped jnp; matching/losses are traced end-to-end so the whole
train step compiles to one XLA program.

Package layout:
    config     -- dataclass config tree, YAML overlay + dotted CLI overrides
    geometry   -- cameras (projection w/ distortion), affine crops,
                  iterative undistortion, batched DLT triangulation
    ops        -- multi-scale deformable sampling (jnp reference + Pallas
                  kernel) and the ProjAttn projective-attention module
    models     -- PoseResNet-50 backbone, DQ decoder, MVGFormer top model,
                  matchers, set criterion
    core       -- train/eval steps, losses, pose NMS, metrics (AP/MPJPE/PCP)
    data       -- typed batch pytrees, dataset loaders, synthetic data
    parallel   -- mesh construction and sharding rules
    utils      -- checkpointing (orbax + torch converter), logging
"""

__version__ = "0.1.0"

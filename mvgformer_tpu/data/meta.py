"""Typed batch pytrees: the static-shape replacement of the reference's
per-view list-of-dicts `meta` (/root/reference/lib/dataset/JointsDataset.py:
197-220). Everything is a struct-of-arrays so one Batch is a fixed pytree of
device arrays — shardable with jax.sharding, no host objects in the step.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import struct

from mvgformer_tpu.geometry.cameras import CameraParams
from mvgformer_tpu.geometry.transforms import (
    get_affine_transform,
    get_affine_transform_inv,
    get_scale,
)

# ImageNet normalization used by the reference input pipeline
# (run/train_3d.py:196-197)
IMAGE_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGE_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


@struct.dataclass
class ViewData:
    """Per-(batch, view) camera and crop information."""

    cameras: CameraParams          # fields shaped (B, V, ...)
    centers: jnp.ndarray           # (B, V, 2) full-image centers (w/2, h/2)
    scales: jnp.ndarray            # (B, V, 2) crop scales in 200px units
    affine: jnp.ndarray            # (B, V, 2, 3) full-image -> net-image
    inv_affine: jnp.ndarray        # (B, V, 2, 3) net-image -> full-image
    joints_vis_2d: jnp.ndarray     # (B, V, M, J) per-view gt 2D visibility

    @property
    def num_views(self) -> int:
        return self.centers.shape[1]


@struct.dataclass
class Targets:
    """Padded ground truth (M = MAX_PEOPLE_NUM slots)."""

    joints_3d: jnp.ndarray       # (B, M, J, 3) world mm
    joints_3d_vis: jnp.ndarray   # (B, M, J) visibility in {0, 1}
    roots_3d: jnp.ndarray        # (B, M, 3)
    num_person: jnp.ndarray      # (B,) int32
    # optional voxelpose predictions (B, M, J, 5) = xyz + vis + score
    # (reference meta 'joints_3d_voxelpose_pred', dq_transformer.py:260-263)
    voxelpose_pred: Optional[jnp.ndarray] = None


@struct.dataclass
class Batch:
    """One training/eval step's input."""

    views: jnp.ndarray           # (B, V, H, W, 3) normalized images (NHWC)
    view_data: ViewData
    targets: Optional[Targets] = None


def build_view_data(cameras: CameraParams,
                    image_wh: np.ndarray,
                    net_image_size,
                    joints_vis_2d: Optional[np.ndarray] = None,
                    max_people: int = 10,
                    num_joints: int = 15) -> ViewData:
    """Assemble ViewData from cameras + per-view full-image sizes.

    cameras fields shaped (B, V, ...); image_wh (B, V, 2) full-image (w, h).
    Mirrors JointsDataset's center/scale/affine construction
    (/root/reference/lib/dataset/JointsDataset.py:117-160) with rot=0.
    """
    B, V = image_wh.shape[:2]
    centers = image_wh.astype(np.float32) / 2.0
    scales = np.stack([
        np.stack([get_scale(image_wh[b, v], net_image_size)
                  for v in range(V)]) for b in range(B)])
    affine = np.asarray(get_affine_transform(centers, scales, net_image_size))
    inv_affine = np.asarray(
        get_affine_transform_inv(centers, scales, net_image_size))
    if joints_vis_2d is None:
        joints_vis_2d = np.ones((B, V, max_people, num_joints),
                                dtype=np.float32)
    return ViewData(
        cameras=cameras,
        centers=jnp.asarray(centers),
        scales=jnp.asarray(scales),
        affine=jnp.asarray(affine),
        inv_affine=jnp.asarray(inv_affine),
        joints_vis_2d=jnp.asarray(joints_vis_2d),
    )


def pad_targets(joints_3d_list, max_people: int, num_joints: int) -> Targets:
    """Pad a per-sample list of (n_i, J, 3) gt arrays to (B, M, J, 3)."""
    B = len(joints_3d_list)
    joints = np.zeros((B, max_people, num_joints, 3), dtype=np.float32)
    vis = np.zeros((B, max_people, num_joints), dtype=np.float32)
    num = np.zeros((B,), dtype=np.int32)
    for b, j in enumerate(joints_3d_list):
        n = min(len(j), max_people)
        joints[b, :n] = j[:n]
        vis[b, :n] = 1.0
        num[b] = n
    roots = joints[:, :, 2]  # ROOTIDX=2 (mid-hip)
    return Targets(
        joints_3d=jnp.asarray(joints),
        joints_3d_vis=jnp.asarray(vis),
        roots_3d=jnp.asarray(roots),
        num_person=jnp.asarray(num),
    )

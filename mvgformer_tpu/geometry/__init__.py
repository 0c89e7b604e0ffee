"""Geometry core: cameras, affine crop transforms, undistortion, DLT.

All functions are pure jnp, fully batched/vmappable, and run inside jit —
there are no host callbacks (the reference calls cv2 per batch item inside
the model forward, /root/reference/lib/models/dq_decoder.py:361-372; here the
affine maps are closed-form jnp).
"""

from mvgformer_tpu.geometry.cameras import (
    CameraParams,
    project_points,
    world_to_camera,
    camera_to_world,
    calib_matrix,
    projection_matrices,
    undistort_points,
)
from mvgformer_tpu.geometry.transforms import (
    affine_from_three_points,
    get_affine_transform,
    get_affine_transform_inv,
    apply_affine,
    get_scale,
    norm2absolute,
    absolute2norm,
)
from mvgformer_tpu.geometry.triangulate import (
    triangulate_dlt,
    homogeneous_to_euclidean,
)

__all__ = [
    "CameraParams",
    "project_points",
    "world_to_camera",
    "camera_to_world",
    "calib_matrix",
    "projection_matrices",
    "undistort_points",
    "affine_from_three_points",
    "get_affine_transform",
    "get_affine_transform_inv",
    "apply_affine",
    "get_scale",
    "norm2absolute",
    "absolute2norm",
    "triangulate_dlt",
    "homogeneous_to_euclidean",
]

"""Affine crop transforms (center/scale/200px convention) in pure jnp.

The reference computes these on the host with cv2.getAffineTransform inside
the model forward for every batch item and layer
(/root/reference/lib/utils/transforms.py:72-112,
/root/reference/lib/models/dq_decoder.py:361-372) — a host sync per step. The
transform is a rot=0 similarity map fully determined by (center, scale,
output_size), so here it is closed-form jnp: computed once per batch inside
the compiled step (or ahead of time in the data pipeline), no host round
trips.
"""

from __future__ import annotations

from typing import Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np


def affine_from_three_points(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Solve the 2x3 affine mapping three src points to three dst points.

    Exact equivalent of cv2.getAffineTransform (the reference's backend,
    transforms.py:108-110): solves dst = A @ [src; 1].
    src, dst: (..., 3, 2). Returns (..., 2, 3).
    """
    ones = jnp.ones(src.shape[:-1] + (1,), dtype=src.dtype)
    M = jnp.concatenate([src, ones], axis=-1)  # (..., 3, 3)
    # A^T = M^{-1} @ dst  ->  A = dst^T @ M^{-T}
    At = jnp.linalg.solve(M, dst)  # (..., 3, 2)
    return jnp.swapaxes(At, -1, -2)


def _triangles(center: jnp.ndarray, scale: jnp.ndarray,
               output_size: Sequence[float], shift=None):
    """Build the src/dst point triangles of get_affine_transform
    (/root/reference/lib/utils/transforms.py:72-106) with rot=0.

    center: (..., 2); scale: (..., 2) in units of 200px.
    """
    center = jnp.asarray(center, dtype=jnp.float32)
    scale = jnp.asarray(scale, dtype=jnp.float32)
    if scale.ndim < center.ndim or scale.shape[-1] != 2:
        scale = jnp.broadcast_to(scale[..., None], center.shape)
    if shift is None:
        shift = jnp.zeros_like(center)
    scale_tmp = scale * 200.0
    src_w = scale_tmp[..., 0]
    src_h = scale_tmp[..., 1]
    dst_w = jnp.float32(output_size[0])
    dst_h = jnp.float32(output_size[1])

    wide = src_w >= src_h  # reference's aspect branch (transforms.py:90-95)
    zeros = jnp.zeros_like(src_w)
    src_dir = jnp.where(
        wide[..., None],
        jnp.stack([zeros, src_w * -0.5], axis=-1),
        jnp.stack([src_h * -0.5, zeros], axis=-1),
    )
    dst_dir = jnp.where(
        wide[..., None],
        jnp.stack([zeros, zeros + dst_w * -0.5], axis=-1),
        jnp.stack([zeros + dst_h * -0.5, zeros], axis=-1),
    )

    def third(a, b):
        d = a - b
        return b + jnp.stack([-d[..., 1], d[..., 0]], axis=-1)

    src0 = center + scale_tmp * shift
    src1 = center + src_dir + scale_tmp * shift
    src2 = third(src0, src1)
    dst0 = jnp.broadcast_to(jnp.stack([dst_w * 0.5, dst_h * 0.5]), src0.shape)
    dst1 = dst0 + dst_dir
    dst2 = third(dst0, dst1)
    src = jnp.stack([src0, src1, src2], axis=-2)
    dst = jnp.stack([dst0, dst1, dst2], axis=-2)
    return src, dst


def get_affine_transform(center, scale, output_size, shift=None) -> jnp.ndarray:
    """(..., 2, 3) full-image -> network-image affine (rot=0)."""
    src, dst = _triangles(center, scale, output_size, shift)
    return affine_from_three_points(src, dst)


def get_affine_transform_inv(center, scale, output_size, shift=None) -> jnp.ndarray:
    """(..., 2, 3) network-image -> full-image affine (the inv=1 branch)."""
    src, dst = _triangles(center, scale, output_size, shift)
    return affine_from_three_points(dst, src)


def apply_affine(points: jnp.ndarray, trans: jnp.ndarray) -> jnp.ndarray:
    """Apply (..., 2, 3) affine(s) to (..., N, 2) points.

    Matches affine_transform_pts_cuda_batch
    (/root/reference/lib/utils/transforms.py:135-141).
    """
    ones = jnp.ones(points.shape[:-1] + (1,), dtype=points.dtype)
    homo = jnp.concatenate([points, ones], axis=-1)  # (..., N, 3)
    return jnp.matmul(homo, jnp.swapaxes(trans, -1, -2),
                      precision=jax.lax.Precision.HIGHEST)


def get_scale(image_size, resized_size) -> np.ndarray:
    """Padding-aware scale in 200px units; host-side helper for the data
    pipeline. Matches /root/reference/lib/utils/transforms.py:170-181."""
    w, h = float(image_size[0]), float(image_size[1])
    w_resized, h_resized = float(resized_size[0]), float(resized_size[1])
    if w / w_resized < h / h_resized:
        w_pad = h / h_resized * w_resized
        h_pad = h
    else:
        w_pad = w
        h_pad = w / w_resized * h_resized
    return np.array([w_pad / 200.0, h_pad / 200.0], dtype=np.float32)


def absolute2norm(coords: jnp.ndarray, grid_size, grid_center) -> jnp.ndarray:
    """World mm -> normalized [0,1] grid coords.
    multi_view_pose_transformer.py:283-289."""
    grid_size = jnp.asarray(grid_size, dtype=coords.dtype)
    grid_center = jnp.asarray(grid_center, dtype=coords.dtype)
    return (coords - grid_center + grid_size / 2.0) / grid_size


def norm2absolute(coords: jnp.ndarray, grid_size, grid_center) -> jnp.ndarray:
    """Normalized [0,1] grid coords -> world mm.
    multi_view_pose_transformer.py:291-297."""
    grid_size = jnp.asarray(grid_size, dtype=coords.dtype)
    grid_center = jnp.asarray(grid_center, dtype=coords.dtype)
    return coords * grid_size + grid_center - grid_size / 2.0

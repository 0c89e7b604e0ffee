"""Camera model: pinhole + radial/tangential distortion, CMU convention.

Replicates the math of /root/reference/lib/utils/cameras.py:137-217
(projection), /root/reference/lib/models/dq_decoder.py:119-220 (iterative
undistortion, calibration matrix) and :223-246 (projection-matrix assembly),
as pure batched jnp. Cameras are carried as a struct-of-arrays pytree so a
whole (batch, views) block of cameras is one set of device arrays — the
reference's per-view list-of-dicts `meta` becomes static-shape tensors.

Conventions (CMU Panoptic, as used by the reference):
    x_cam = R @ (x_world - T)           world -> camera
    y     = x_cam[:2] / (x_cam[2] + 1e-5)
    pixel = f * distort(y) + c
Distortion: radial k1,k2,k3 + tangential p1,p2 in the *reference's* layout
(k stored as 3-vector, p as 2-vector; cameras.py:97-134).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

# Geometry matmuls are tiny but precision-critical: AP collapses if camera
# math runs at the TPU's default bf16 matmul precision (SURVEY.md §7 "hard
# parts"). Force full f32 accumulation everywhere in this module.
_mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)


@struct.dataclass
class CameraParams:
    """Batched camera parameters; leading dims are arbitrary (e.g. (B, V)).

    Fields mirror unfold_camera_param_batch
    (/root/reference/lib/utils/cameras.py:118-134).
    """

    R: jnp.ndarray  # (..., 3, 3) world->camera rotation
    T: jnp.ndarray  # (..., 3, 1) camera position in world coords
    f: jnp.ndarray  # (..., 2)    focal lengths fx, fy
    c: jnp.ndarray  # (..., 2)    principal point cx, cy
    k: jnp.ndarray  # (..., 3)    radial distortion k1, k2, k3
    p: jnp.ndarray  # (..., 2)    tangential distortion p1, p2

    @property
    def batch_shape(self):
        return self.R.shape[:-2]


def _rot_apply(R: jnp.ndarray, d: jnp.ndarray,
               transpose: bool = False) -> jnp.ndarray:
    """Apply a (..., 3, 3) rotation to (..., N, 3) points, scalarized.

    A (3,3)@(3,N) batched matmul pads its 3-row operands to MXU tiles and
    costs ~3 ms/layer at production N (PERF.md roadmap item 0); nine
    explicit broadcast products run at VPU/bandwidth speed and keep f32
    accumulation (the 3-term sums associate left-to-right, within the
    1e-4 oracle tolerance of the Precision.HIGHEST matmul)."""
    cols = [d[..., 0], d[..., 1], d[..., 2]]  # each (..., N)

    def row(i):
        r = [R[..., j, i, None] if transpose else R[..., i, j, None]
             for j in range(3)]
        return r[0] * cols[0] + r[1] * cols[1] + r[2] * cols[2]

    return jnp.stack([row(0), row(1), row(2)], axis=-1)


def world_to_camera(x: jnp.ndarray, cam: CameraParams) -> jnp.ndarray:
    """(..., N, 3) world points -> camera frame. cameras.py:225-238."""
    # x_cam = R (x - T)
    return _rot_apply(cam.R, x - jnp.swapaxes(cam.T, -1, -2))


def camera_to_world(x: jnp.ndarray, cam: CameraParams) -> jnp.ndarray:
    """(..., N, 3) camera points -> world frame. cameras.py:241-255."""
    return (_rot_apply(cam.R, x, transpose=True)
            + jnp.swapaxes(cam.T, -1, -2))


def _distort(y: jnp.ndarray, cam: CameraParams) -> jnp.ndarray:
    """Apply radial+tangential distortion to normalized coords y (..., N, 2).

    Matches project_point_radial_batch
    (/root/reference/lib/utils/cameras.py:167-207) including its quirk that
    the tangential term `2*tan` multiplies both axes and the p-cross term is
    [p2, p1] @ r2.
    """
    k1 = cam.k[..., 0:1]
    k2 = cam.k[..., 1:2]
    k3 = cam.k[..., 2:3]
    p1 = cam.p[..., 0:1]
    p2 = cam.p[..., 1:2]
    r2 = jnp.sum(y * y, axis=-1)  # (..., N)
    radial = 1.0 + k1 * r2 + k2 * r2 ** 2 + k3 * r2 ** 3
    tan = p1 * y[..., 1] + p2 * y[..., 0]
    corr = (radial + 2.0 * tan)[..., None]  # (..., N, 1)
    cross = jnp.stack([p2, p1], axis=-1) * r2[..., None]  # (..., N, 2)
    return y * corr + cross


def project_points(x: jnp.ndarray, cam: CameraParams,
                   deal_distortion: bool = True) -> jnp.ndarray:
    """Project world points (..., N, 3) to pixels (..., N, 2).

    Matches project_pose_batch (/root/reference/lib/utils/cameras.py:210-217)
    including the +1e-5 depth epsilon.
    """
    xcam = world_to_camera(x, cam)
    y = xcam[..., :2] / (xcam[..., 2:3] + 1e-5)
    if deal_distortion:
        y = _distort(y, cam)
    return cam.f[..., None, :] * y + cam.c[..., None, :]


def calib_matrix(cam: CameraParams) -> jnp.ndarray:
    """(..., 3, 3) intrinsics K. dq_decoder.py:207-220."""
    shape = cam.batch_shape
    zeros = jnp.zeros(shape + (1,), dtype=cam.f.dtype)
    ones = jnp.ones(shape + (1,), dtype=cam.f.dtype)
    fx, fy = cam.f[..., 0:1], cam.f[..., 1:2]
    cx, cy = cam.c[..., 0:1], cam.c[..., 1:2]
    row0 = jnp.concatenate([fx, zeros, cx], axis=-1)
    row1 = jnp.concatenate([zeros, fy, cy], axis=-1)
    row2 = jnp.concatenate([zeros, zeros, ones], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def projection_matrices(cam: CameraParams,
                        inv_trans: bool = True) -> jnp.ndarray:
    """(..., 3, 4) projection matrices P = K [R | T'].

    With inv_trans=True (CMU convention), T' = -R @ T so that
    P @ [x;1] = K(Rx - RT) = K R(x - T). dq_decoder.py:223-246.
    """
    T = -_mm(cam.R, cam.T) if inv_trans else cam.T
    RT = jnp.concatenate([cam.R, T], axis=-1)
    return _mm(calib_matrix(cam), RT)


def undistort_points(points: jnp.ndarray, cam: CameraParams,
                     iter_num: int = 5) -> jnp.ndarray:
    """Iteratively undistort pixel points (..., N, 2) -> pixel points.

    OpenCV-style fixed-point iteration, matching `undistort`
    (/root/reference/lib/models/dq_decoder.py:119-204): normalize by K⁻¹,
    iterate `iter_num` times, re-apply K. The reference builds a 12-vector of
    OpenCV coefficients with entries 5..11 zero, so icdist's numerator is
    identically 1 and the thin-prism terms vanish; we write the live math
    directly with named coefficients.
    """
    fx, fy = cam.f[..., 0:1], cam.f[..., 1:2]
    cx, cy = cam.c[..., 0:1], cam.c[..., 1:2]
    k1 = cam.k[..., 0:1]
    k2 = cam.k[..., 1:2]
    k3 = cam.k[..., 2:3]
    p1 = cam.p[..., 0:1]
    p2 = cam.p[..., 1:2]

    # normalize: K^-1 [u, v, 1]
    x0 = (points[..., 0] - cx) / fx
    y0 = (points[..., 1] - cy) / fy
    x, y = x0, y0
    for _ in range(iter_num):
        r2 = x * x + y * y
        icdist = 1.0 / (1.0 + ((k3 * r2 + k2) * r2 + k1) * r2)
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        x = (x0 - dx) * icdist
        y = (y0 - dy) * icdist
    u = fx * x + cx
    v = fy * y + cy
    return jnp.stack([u, v], axis=-1)

"""Confidence-weighted DLT triangulation, fully batched for TPU.

Replicates triangulate_point_from_multiple_views_linear_torch_batch
(/root/reference/lib/mvn/utils/multiview.py:170-228): build per-point
A = conf * (p * P_row3 - P_rows12), take the null-space direction of A, and
dehomogenize. The reference loops over batch items and calls torch SVD per
sample (multiview.py:257-269); here all (batch, points) collapse into one
batched solve.

Solvers:
    'eigh' (default) -- null vector = eigenvector of the smallest eigenvalue
        of the 4x4 Gram matrix AᵀA. On TPU a batched 4x4 eigh is far cheaper
        than SVD of (2V, 4) stacks, and the dehomogenization v[:3]/v[3] is
        sign-invariant, so it matches the reference's -V[:, 3] convention
        (multiview.py:220-221) exactly up to fp error.
    'svd'  -- jnp.linalg.svd of A, bit-closer mirror of the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def homogeneous_to_euclidean(points: jnp.ndarray) -> jnp.ndarray:
    """(..., D+1) -> (..., D). multiview.py:homogeneous_to_euclidean."""
    return points[..., :-1] / points[..., -1:]


def _dlt_system(proj: jnp.ndarray, points2d: jnp.ndarray,
                confidences: jnp.ndarray | None) -> jnp.ndarray:
    """Build A (..., 2V, 4) from proj (..., V, 3, 4), points (..., V, 2)."""
    row3 = proj[..., 2:3, :]  # (..., V, 1, 4)
    rows12 = proj[..., :2, :]  # (..., V, 2, 4)
    A = row3 * points2d[..., :, :, None] - rows12  # (..., V, 2, 4)
    if confidences is not None:
        A = A * confidences[..., :, None, None]
    shape = A.shape
    return A.reshape(shape[:-3] + (shape[-3] * 2, 4))


def triangulate_dlt(proj: jnp.ndarray, points2d: jnp.ndarray,
                    confidences: jnp.ndarray | None = None,
                    solver: str = "eigh") -> jnp.ndarray:
    """Triangulate 3D points from multiple views.

    Args:
        proj:        (..., V, 3, 4) projection matrices.
        points2d:    (..., V, 2) pixel observations (original image coords,
                     already undistorted).
        confidences: (..., V) per-view weights in [0, 1], or None.
        solver:      'eigh' | 'svd'.

    Returns:
        (..., 3) triangulated points.
    """
    A = _dlt_system(proj, points2d, confidences).astype(jnp.float32)
    if solver == "svd":
        _, _, vh = jnp.linalg.svd(A, full_matrices=False)
        v = -vh[..., 3, :]  # matches multiview.py:220 sign convention
    elif solver == "eigh":
        # Column-equilibrate before forming the Gram matrix: raw A entries
        # reach ~1e7 (pixels x focal x mm translations), and squaring that
        # overflows f32's mantissa. Scaling columns leaves the exact
        # null-space direction unchanged (A D D^-1 v = 0) and keeps the
        # 4x4 eigproblem well-conditioned in f32.
        colscale = jnp.max(jnp.abs(A), axis=-2, keepdims=True) + 1e-12
        An = A / colscale
        gram = jnp.matmul(jnp.swapaxes(An, -1, -2), An,
                          precision=jax.lax.Precision.HIGHEST)
        _, vecs = jnp.linalg.eigh(gram)  # eigenvalues ascending
        v = vecs[..., :, 0] / colscale[..., 0, :]
    else:
        raise ValueError(f"unknown solver: {solver}")
    return homogeneous_to_euclidean(v)

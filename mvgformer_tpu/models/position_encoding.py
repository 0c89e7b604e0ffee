"""Positional encodings: sine embeddings, camera rays, 2D coord maps.

Mirrors /root/reference/lib/models/position_encoding.py: the sine embedding
(:25-65, built by the MvP base model), per-pixel camera ray directions for
the use_rayconv ProjAttn mode (get_rays_new, :256-282) and normalized 2D
coordinates for use_2d_coordconv (get_2d_coords, :239-253).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

_mm = lambda a, b: jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def position_embedding_sine(h: int, w: int, num_pos_feats: int = 128,
                            temperature: float = 10000.0,
                            normalize: bool = True,
                            scale: float = 2 * math.pi) -> jnp.ndarray:
    """(h, w, 2*num_pos_feats) sine/cosine 2D embedding
    (position_encoding.py:25-65, no-mask path)."""
    y = jnp.arange(1, h + 1, dtype=jnp.float32)[:, None]
    x = jnp.arange(1, w + 1, dtype=jnp.float32)[None, :]
    y = jnp.broadcast_to(y, (h, w))
    x = jnp.broadcast_to(x, (h, w))
    if normalize:
        eps = 1e-6
        y = y / (h + eps) * scale
        x = x / (w + eps) * scale
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    pos_x = x[..., None] / dim_t
    pos_y = y[..., None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])],
                      axis=-1).reshape(h, w, -1)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])],
                      axis=-1).reshape(h, w, -1)
    return jnp.concatenate([pos_y, pos_x], axis=-1)


def crop_intrinsics(K: jnp.ndarray, affine: jnp.ndarray) -> jnp.ndarray:
    """Compose the net-image crop affine with K
    (multi_view_pose_transformer.py:326-329): K_crop = [A; 0 0 1] @ K."""
    B = K.shape[:-2]
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 1.0]), B + (1, 3)).astype(K.dtype)
    A3 = jnp.concatenate([affine, bottom], axis=-2)
    return _mm(A3, K)


def get_rays(image_size: Tuple[int, int], h: int, w: int,
             K_crop: jnp.ndarray, R: jnp.ndarray,
             T_standard: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel unit ray directions in world coords, (..., h, w, 3).

    Matches get_rays_new (position_encoding.py:256-282): K scaled by the
    feature-map ratio, pixel -> camera -> world, normalized direction.
    T_standard is the reference's 'standard_T' (t such that x_cam = Rx + t).
    """
    ratio = w / float(image_size[0])
    K = K_crop.astype(jnp.float32)
    K = K.at[..., :2, :].multiply(ratio)
    R = R.astype(jnp.float32)
    T = T_standard.astype(jnp.float32).reshape(T_standard.shape[:-2] + (3, 1))

    jj, ii = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    xy1 = jnp.stack([ii, jj, jnp.ones_like(ii)], axis=-1).reshape(-1, 3)

    Kinv = jnp.linalg.inv(K)
    pixel_cam = _mm(xy1, jnp.swapaxes(Kinv, -1, -2))  # (..., hw, 3)
    rays_o = -_mm(jnp.swapaxes(R, -1, -2), T)  # (..., 3, 1)
    pixel_world = _mm(pixel_cam - jnp.swapaxes(T, -1, -2), R)
    rays_d = pixel_world - jnp.swapaxes(rays_o, -1, -2)
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    return rays_d.reshape(rays_d.shape[:-2] + (h, w, 3))


def get_2d_coords(h: int, w: int) -> jnp.ndarray:
    """Normalized (h, w, 2) pixel coordinates (position_encoding.py:239-253)."""
    jj, ii = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    return jnp.stack([ii / w, jj / h], axis=-1)
